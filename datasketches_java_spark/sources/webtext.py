"""Deterministic Common-Crawl-style webtext fixture generator.

FIXTURES.md §1: `webtext_pages(url, warc_ts, html, lang, text)` plus
golden tables `golden_dup_pairs`, `golden_clusters`, `golden_text`.
Everything is seeded (default 42) and wall-clock-free so pytest and
the bench are reproducible.  No Spark dependency — pandas/pyarrow out.

Duplicate structure (ground truth emitted alongside):
  - ~60 % singleton word-salad docs,
  - planted near-dup clusters (sizes 2–50, zipf) at controlled
    shingle-Jaccard levels {1.0, .95, .9, .85, .8, .7},
  - hot-template sites: many pages sharing dominant boilerplate
    (the LSH hot-bucket / capped-explode stress case),
  - long-shared-substring pairs (≥256-char common run, J < 0.8) for
    the suffix-array pass.

Golden Jaccard is computed on exact w=5 word-shingle string sets with
the same normalization as functions/text.py (lower + non-alnum split),
so the pipeline's exact-verification stage and the golden agree by
construction.
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

from ..config import DUP_JACCARD_THRESHOLD, SHINGLE_W

LANGS = ["en", "de", "fr", "es", "zh"]
_SYLL = ["ka", "lo", "mi", "ra", "ten", "zu", "be", "cor", "dal", "fi",
         "gan", "hel", "ix", "jor", "kul", "lem", "nor", "pos", "qua", "rin",
         "sol", "tur", "ul", "vex", "wim", "yor", "zan", "bri", "cla", "dre"]


def _vocab(n_words: int, rng: np.random.Generator) -> list[str]:
    words, seen = [], set()
    while len(words) < n_words:
        k = rng.integers(2, 5)
        w = "".join(_SYLL[i] for i in rng.integers(0, len(_SYLL), k))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def _shingle_set(tokens: list[str], w: int = SHINGLE_W) -> frozenset:
    if len(tokens) < w:
        return frozenset([" ".join(tokens)])
    return frozenset(" ".join(tokens[i:i + w]) for i in range(len(tokens) - w + 1))


def _jaccard(a: frozenset, b: frozenset) -> float:
    u = len(a | b)
    return len(a & b) / u if u else 1.0


def _near_dup(tokens: list[str], target_j: float, vocab: list[str],
              rng: np.random.Generator) -> list[str]:
    """Token-replacement edits approximating a target shingle-Jaccard."""
    if target_j >= 1.0:
        return list(tokens)
    # e replacement edits: |inter| ≈ s-5e, |union| ≈ s+5e →
    # J=(s-5e)/(s+5e) → e = s(1-J)/(w(1+J))
    s = max(len(tokens) - SHINGLE_W + 1, 1)
    n_edits = max(int(round(s * (1.0 - target_j) / (SHINGLE_W * (1 + target_j)))), 1)
    out = list(tokens)
    pos = rng.choice(len(out), size=min(n_edits, len(out)), replace=False)
    for p in pos:
        op = rng.integers(0, 3)
        w = vocab[rng.integers(0, len(vocab))]
        p = int(p) % len(out)  # deletes shrink the list; stay in range
        if op == 0:
            out[p] = w                       # replace
        elif op == 1:
            out.insert(p, w)                 # insert
        elif len(out) > SHINGLE_W + 2:
            del out[p]                       # delete
    return out


_HTML_TMPL = ("<html><head><title>{title}</title></head><body>"
              "<nav>{nav}</nav><article>{text}</article>"
              "<footer>{footer}</footer></body></html>")


def _render_html(site: int, text: str) -> str:
    return _HTML_TMPL.format(
        title=f"site{site:05d}", nav=f"home products about site{site:05d}",
        footer=f"copyright site{site:05d} contact terms", text=text)


def generate_webtext(n_docs: int, seed: int = 42,
                     hot_site_pages: int | None = None) -> dict[str, pd.DataFrame]:
    """Build the fixture.  Returns dict of DataFrames:
    pages, golden_dup_pairs, golden_clusters, golden_text."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(2000, rng)
    varr = np.array(vocab)
    n_sites = max(n_docs // 50, 5)
    hot_site_pages = hot_site_pages or max(min(n_docs // 10, 500), 8)

    docs: list[list[str]] = []          # token lists
    group_of: list[int] = []            # planted group id (-1 = singleton)
    next_group = 0

    # -- planted near-dup clusters (~25 % of docs) --
    j_levels = [1.0, 0.95, 0.9, 0.85, 0.8, 0.7]
    budget = int(n_docs * 0.25)
    while budget > 0:
        size = min(int(rng.zipf(2.0)) + 1, 50, budget) if budget > 1 else 1
        if size < 2:
            break
        base = list(varr[rng.integers(0, len(varr), int(rng.integers(100, 220)))])
        docs.append(base)
        group_of.append(next_group)
        for _ in range(size - 1):
            j = j_levels[rng.integers(0, len(j_levels))]
            docs.append(_near_dup(base, j, vocab, rng))
            group_of.append(next_group)
        next_group += 1
        budget -= size

    # -- hot-template site: dominant boilerplate, tiny unique body
    # (pairwise J ≈ 0.9 — one giant golden cluster, the capped-explode
    # stress case) --
    boiler = list(varr[rng.integers(0, len(varr), 300)])
    for _ in range(min(hot_site_pages, max(n_docs - len(docs), 0))):
        body = list(varr[rng.integers(0, len(varr), 6)])
        at = int(rng.integers(0, len(boiler)))
        docs.append(boiler[:at] + body + boiler[at:])
        group_of.append(next_group)
    hot_group = next_group
    next_group += 1

    # -- long-shared-substring pairs (J < 0.8, common run >= 256 chars) --
    n_lcs_pairs = max(n_docs // 100, 2)
    shared_run = list(varr[rng.integers(0, len(varr), 60)])  # ~60 tokens ≈ 360+ chars
    for _ in range(n_lcs_pairs):
        if len(docs) + 2 > n_docs:
            break
        a = list(varr[rng.integers(0, len(varr), 150)]) + shared_run
        b = shared_run + list(varr[rng.integers(0, len(varr), 150)])
        docs.extend([a, b])
        group_of.extend([-2, -2])  # marked: LCS pair, not dup

    # -- singletons fill the rest --
    while len(docs) < n_docs:
        docs.append(list(varr[rng.integers(0, len(varr), int(rng.integers(80, 200)))]))
        group_of.append(-1)

    docs = docs[:n_docs]
    group_of = group_of[:n_docs]

    # -- shuffle rows deterministically, assemble table --
    order = rng.permutation(len(docs))
    t0 = datetime(2025, 1, 1, tzinfo=timezone.utc)
    rows = []
    lang_p = np.array([0.5, 0.2, 0.13, 0.1, 0.07])
    langs = rng.choice(LANGS, size=len(docs), p=lang_p)
    for k, i in enumerate(order):
        site = int(i) % n_sites
        text = " ".join(docs[i])
        url = f"https://site{site:05d}.example/p/{int(i):08d}"
        rows.append((url, t0 + timedelta(seconds=17 * k),
                     _render_html(site, text).encode("utf-8"),
                     str(langs[k]), text, int(group_of[i])))
    pages = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "lang",
                                        "text", "_group"])

    # -- golden tables: exact shingle-Jaccard within planted groups --
    shingles = {u: _shingle_set(t.split(" "))
                for u, t in zip(pages["url"], pages["text"])}
    by_group: dict[int, list[str]] = {}
    for u, g in zip(pages["url"], pages["_group"]):
        if g >= 0:
            by_group.setdefault(int(g), []).append(u)
    pair_rows = []
    for g, urls in by_group.items():
        urls = sorted(urls)
        for x in range(len(urls)):
            for y in range(x + 1, len(urls)):
                j = _jaccard(shingles[urls[x]], shingles[urls[y]])
                if j >= DUP_JACCARD_THRESHOLD:
                    pair_rows.append((urls[x], urls[y], j))
    golden_pairs = pd.DataFrame(pair_rows,
                                columns=["url_a", "url_b", "exact_jaccard"])

    # union-find for golden clusters
    parent: dict[str, str] = {}

    def find(u: str) -> str:
        parent.setdefault(u, u)
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for r in golden_pairs.itertuples():
        ra, rb = find(r.url_a), find(r.url_b)
        if ra != rb:
            hi, lo = max(ra, rb), min(ra, rb)
            parent[hi] = lo
    cluster_rows = [(u, find(u)) for u in sorted(parent)]
    golden_clusters = pd.DataFrame(cluster_rows, columns=["url", "cluster_id"])

    golden_text = pd.DataFrame(
        [(u, hashlib.sha256(t.encode("utf-8")).hexdigest())
         for u, t in zip(pages["url"], pages["text"])],
        columns=["url", "text_sha256"])

    pages = pages.drop(columns=["_group"])
    return {"pages": pages, "golden_dup_pairs": golden_pairs,
            "golden_clusters": golden_clusters, "golden_text": golden_text,
            "hot_group_size": sum(1 for g in group_of if g == hot_group)}


_URL_COLS = {"pages": ["url"], "golden_dup_pairs": ["url_a", "url_b"],
             "golden_clusters": ["url", "cluster_id"],
             "golden_text": ["url"]}


def _write_one(df: pd.DataFrame, path: str) -> None:
    # µs timestamps (Spark rejects NANOS); small row groups so the
    # scan yields parallel splits — a single row group caps every
    # downstream narrow stage at one task
    df.to_parquet(path, index=False, coerce_timestamps="us",
                  allow_truncated_timestamps=True, row_group_size=4096)


def write_fixture(out_dir: str, n_docs: int, seed: int = 42,
                  shard_size: int = 500_000) -> dict[str, str]:
    """Write parquet fixture + goldens; idempotent (skips if present).

    Above ``shard_size`` docs the fixture generates in independent
    shards written as part-files under ``pages.parquet/`` etc. (a
    directory — Spark/pyarrow/DuckDB all read it transparently): the
    pandas-side generator holds one shard in memory at a time, so a
    10M-doc soak fixture peaks at the ~few-GB shard cost instead of
    >100 GB for a single monolithic build.  Shard URLs get a
    ``https://shNNN.`` host prefix (applied to every golden table too)
    so planted groups and urls stay globally unique."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {k: os.path.join(out_dir, f"{k}.parquet")
             for k in ("pages", "golden_dup_pairs", "golden_clusters",
                       "golden_text")}
    if n_docs <= shard_size:
        if any(os.path.isdir(p) for p in paths.values()):
            raise ValueError(
                f"{out_dir} holds a SHARDED fixture; use a fresh "
                f"out_dir for a monolithic (n_docs <= {shard_size}) "
                f"request instead of silently reusing it")
        if all(os.path.isfile(p) for p in paths.values()):
            return paths
        tables = generate_webtext(n_docs, seed)
        for k, p in paths.items():
            _write_one(tables[k], p)
        return paths

    if any(os.path.isfile(p) for p in paths.values()):
        raise ValueError(
            f"{out_dir} holds a MONOLITHIC fixture; use a fresh "
            f"out_dir for a sharded (n_docs > {shard_size}) request")
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return paths
    for p in paths.values():
        os.makedirs(p, exist_ok=True)
    n_shards = (n_docs + shard_size - 1) // shard_size
    for s in range(n_shards):
        n_s = min(shard_size, n_docs - s * shard_size)
        tables = generate_webtext(n_s, seed + 7919 * s)
        prefix = f"https://sh{s:03d}."
        for k, p in paths.items():
            df = tables[k]
            for c in _URL_COLS[k]:
                df[c] = df[c].str.replace("https://", prefix, n=1)
            _write_one(df, os.path.join(p, f"part-{s:04d}.parquet"))
    with open(marker, "w") as f:
        f.write(f"{n_docs} docs in {n_shards} shards\n")
    return paths


def extract_text_column():
    """JVM-side deterministic HTML→text extraction (Column expr).

    The generator wraps text in <article>…</article>; extraction is a
    regexp capture — byte-identical to the `text` column by
    construction (the per-url invariant, BASELINE.json input_hint).
    """
    from pyspark.sql import functions as F
    return F.regexp_extract(
        F.col("html").cast("string"), r"<article>(.*?)</article>", 1)
