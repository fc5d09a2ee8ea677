"""API docs gate: every public symbol in the user-facing modules
(functions/, operators/, plans/, streaming/, sources/) carries a
docstring, so adoption does not require reading __spark_entry__.py."""

from __future__ import annotations

import importlib
import inspect
import pkgutil

import datasketches_java_spark.functions as F_pkg
import datasketches_java_spark.operators as O_pkg

PACKAGES = ["datasketches_java_spark.functions",
            "datasketches_java_spark.operators",
            "datasketches_java_spark.plans",
            "datasketches_java_spark.streaming",
            "datasketches_java_spark.sources"]


def _public_symbols():
    for pkg_name in PACKAGES:
        pkg = importlib.import_module(pkg_name)
        for m in pkgutil.iter_modules(pkg.__path__):
            mod = importlib.import_module(f"{pkg_name}.{m.name}")
            for name, obj in vars(mod).items():
                if name.startswith("_"):
                    continue
                if not (inspect.isfunction(obj) or inspect.isclass(obj)):
                    continue
                if getattr(obj, "__module__", None) != mod.__name__:
                    continue  # re-export, documented at its home
                yield f"{mod.__name__}.{name}", obj


def test_public_api_has_docstrings():
    missing = [qual for qual, obj in _public_symbols()
               if not (inspect.getdoc(obj) or "").strip()]
    assert not missing, f"undocumented public API: {missing}"


def test_module_docstrings():
    for pkg_name in PACKAGES:
        pkg = importlib.import_module(pkg_name)
        for m in pkgutil.iter_modules(pkg.__path__):
            mod = importlib.import_module(f"{pkg_name}.{m.name}")
            assert (mod.__doc__ or "").strip(), f"no module doc: {mod.__name__}"
