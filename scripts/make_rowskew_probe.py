#!/usr/bin/env python3
"""Derive a ROW-level-skew probe: one pathological 1000x-length document.

The r11 skew probe covers KEY skew (hot user/order/token — SCALE.md
"skew probe"); this covers the other skew axis a 100 TB text pipeline
WILL meet: a single pathological document orders of magnitude longer
than the corpus median (concatenated crawl dumps, minified JS, OCR
runs). Key-skew defenses don't apply — the hazard is per-ROW: explode
fan-out (one input row -> 10^5 token rows inside one task), within-row
higher-order-function arrays (10^5-element transform/aggregate), and
per-doc state in quality gates.

Construction: `.tmp/sf1_rowskew` = the sf1 probe with ONE document's
text replaced by its own word sequence tiled to MEGA_WORDS words
(~1000x the corpus max of 100, ~600 KB text). Tiling the doc's OWN
vocabulary keeps the corpus vocabulary unchanged — token-keyed joins
and df ranks shift only by this doc's counts, so any text query's
answer moves for the honest reason (the doc IS different), and both
engines read the same parquet so every answer is still cross-checked
by the standard parity sweep. n_chars is recomputed (the catalog
asserts n_chars == length(text)). The victim doc_id avoids the
planted-copy residues (% 25 != 0, % 10 >= 3) so copy-planting queries
don't square the pathology.

All other tables are byte-copied. Evidence printed: the mega doc's
word/char counts vs the corpus max, n_chars integrity, corpus row
count unchanged.

Usage:
    python scripts/make_rowskew_probe.py [--src .tmp/sf1] [--out .tmp/sf1_rowskew]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MEGA_WORDS = 100_000
COPIED = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "embeddings",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=os.path.join(REPO, ".tmp", "sf1"))
    ap.add_argument("--out", default=os.path.join(REPO, ".tmp", "sf1_rowskew"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    docs = f"read_parquet('{args.src}/documents.parquet')"
    victim, = con.execute(
        f"SELECT min(doc_id) FROM {docs} "
        "WHERE doc_id % 25 != 0 AND doc_id % 10 >= 3 "
        "AND len(string_split(text, ' ')) >= 20"
    ).fetchone()
    n_words, = con.execute(
        f"SELECT len(string_split(text, ' ')) FROM {docs} "
        f"WHERE doc_id = {victim}"
    ).fetchone()
    # tile the victim's own words to MEGA_WORDS (repeat ceil times,
    # then trim to exactly MEGA_WORDS words)
    reps = -(-MEGA_WORDS // n_words)
    mega_sql = f"""
        SELECT doc_id,
               CASE WHEN doc_id = {victim}
                    THEN array_to_string(
                        (list_transform(generate_series(1, {reps}),
                                        i -> string_split(text, ' '))
                         .flatten())[1:{MEGA_WORDS}], ' ')
                    ELSE text END AS text,
               lang, source,
               CASE WHEN doc_id = {victim}
                    THEN length(array_to_string(
                        (list_transform(generate_series(1, {reps}),
                                        i -> string_split(text, ' '))
                         .flatten())[1:{MEGA_WORDS}], ' '))
                    ELSE n_chars END AS n_chars
        FROM {docs}
    """
    dst = f"{args.out}/documents.parquet"
    if not os.path.exists(dst):
        con.execute(f"COPY ({mega_sql}) TO '{dst}' (FORMAT PARQUET)")
    for table in COPIED:
        tdst = f"{args.out}/{table}.parquet"
        if not os.path.exists(tdst):
            shutil.copyfile(f"{args.src}/{table}.parquet", tdst)

    out = f"read_parquet('{dst}')"
    n, nbad = con.execute(
        f"SELECT count(*), sum(CASE WHEN n_chars <> length(text) "
        f"THEN 1 ELSE 0 END) FROM {out}"
    ).fetchone()
    mega_w, mega_c = con.execute(
        f"SELECT len(string_split(text, ' ')), n_chars FROM {out} "
        f"WHERE doc_id = {victim}"
    ).fetchone()
    max_other = con.execute(
        f"SELECT max(len(string_split(text, ' '))) FROM {out} "
        f"WHERE doc_id != {victim}"
    ).fetchone()[0]
    print(f"victim doc {victim}: {mega_w} words, {mega_c} chars "
          f"(corpus max otherwise {max_other} words)", flush=True)
    print(f"docs: {n} rows, n_chars<>length(text): {nbad}", flush=True)
    ok = (mega_w == MEGA_WORDS and nbad == 0
          and mega_w >= 500 * max_other)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
