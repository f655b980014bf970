#!/usr/bin/env python3
"""Derive a SKEW-INJECTED variant of the sf1 scale probe.

VERDICT r10 "What's missing" #2: the sf1 probe replicates sf0.1 with
FK-disjoint keys, so every shuffle key's skew profile is identical to
sf0.1's — AQE skew-join splitting, the salted-join path
(operators/skew.py), and the chunked-postings defense have never faced
a genuinely hot key at 10x. This script injects a realistic Zipf head
into a COPY of the sf1 scratch data (read-only inputs untouched) so

  * the heavy-tier parity sweep can re-verify correctness UNDER skew
    (scripts/parity_sweep.py <out-dir> <names...> — both engines read
    the same skewed parquet, so the oracle contract is unchanged), and
  * scripts/skew_probe_time.py can measure straggler ratios and verify
    the skew defenses (AQE skew split, salting, chunked postings)
    actually engage on a hot key.

Injected skew (deterministic, documented, FK-safe):

* events: ONE HOT USER owns ~20% of all events — rows with
  event_id %% 5 == 0 get user_id := <smallest existing user_id>.
  ts/event_id untouched, so the subus_key fold stays collision-free
  and per-event comparisons are unaffected; only the user_id
  DISTRIBUTION changes (sessionize / per-user windows / user joins
  now have a 200k-row hot partition at factor-10 scale).
* lineitem: ONE HOT ORDER key receives ~10% of all lineitems — rows
  with l_orderkey %% 10 == 3 get l_orderkey := <smallest o_orderkey
  ending in 3> (an EXISTING order, itself %% 10 == 3 so it keeps its
  own lines; FK validity preserved — every l_orderkey still resolves).
  Order-key joins/aggs now carry a ~600k-row hot key.
* documents: ONE HOT TOKEN appears in ~30% of docs — rows with
  doc_id %% 10 < 3 get text := text || ' zqhotzq' and n_chars
  recomputed (the fixture invariant n_chars = length(text) is kept).
  'zqhotzq' is outside every replica's Caesar-rotated vocabulary, so
  it adds exactly one df=15k head term to the token tables (inverted
  index postings, token joins) without perturbing any existing
  near-dup relationship below the similarity thresholds.
* all other tables: byte-copied unchanged.

r12 adds ``--zipf``: instead of ONE planted hot key per table, a
realistic Zipf(alpha=1.0) HEAD of K=20 keys holding ~35% of volume
between them (VERDICT r11 "What's missing" #2 — several medium-hot
keys at 0.5-10% each change AQE's split decisions vs one giant, and
are the regime where sessionize_split's span and salt counts get
tuned). Deterministic per-mille bucket assignment: row belongs to
head key k iff ``id % 1000`` falls in the k-th cumulative-share
bucket, shares s_k = 0.35/(k*H_20). Head keys:

* events: the 20 smallest existing user_ids (top user ~9.7% of
  events, 20th ~0.5%);
* lineitem: 20 existing o_orderkeys (FK-valid by construction);
* documents: 20 new all-alpha tokens ``zqzipfa``..``zqzipft``
  appended to text (n_chars recomputed), each outside every
  replica's Caesar-rotated vocabulary; a doc gains at most ONE hot
  token (buckets are disjoint).

Usage:
    python scripts/make_skew_probe.py [--src DIR] [--out DIR] [--zipf]

Defaults: src <repo>/.tmp/sf1 (run scripts/make_scale_probe.py first),
out <repo>/.tmp/sf1_skew (``--zipf``: <repo>/.tmp/sf1_zipf).
Idempotent per table (delete out dir to regenerate). Prints the
injected head shares as evidence.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HOT_TOKEN = "zqhotzq"
COPIED = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "embeddings",
)

# --zipf head: K keys, alpha=1.0, ~35% of volume across them
ZIPF_K = 20
ZIPF_TOTAL = 0.35


def zipf_buckets() -> list[tuple[int, int]]:
    """Per-mille [lo, hi) bucket for each head rank 1..K: row with
    ``id % 1000`` in bucket k belongs to head key k."""
    h = sum(1.0 / k for k in range(1, ZIPF_K + 1))
    cum, edges = 0.0, [0]
    for k in range(1, ZIPF_K + 1):
        cum += ZIPF_TOTAL / (k * h)
        edges.append(round(1000 * cum))
    return [(edges[k - 1], edges[k]) for k in range(1, ZIPF_K + 1)]


def bucket_case(id_expr: str, values: list, else_expr: str) -> str:
    """CASE expression assigning ``values[k]`` where ``id_expr % 1000``
    falls in the k-th Zipf bucket, else ``else_expr``."""
    arms = "\n".join(
        f"WHEN {id_expr} % 1000 >= {lo} AND {id_expr} % 1000 < {hi}"
        f" THEN {v}"
        for (lo, hi), v in zip(zipf_buckets(), values)
    )
    return f"CASE {arms} ELSE {else_expr} END"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=os.path.join(REPO, ".tmp", "sf1"))
    ap.add_argument("--out", default=None)
    ap.add_argument("--zipf", action="store_true",
                    help="plant a 20-key Zipf head instead of one hot key")
    args = ap.parse_args()
    if args.out is None:
        args.out = os.path.join(
            REPO, ".tmp", "sf1_zipf" if args.zipf else "sf1_skew"
        )
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    if args.zipf:
        head_users = [r[0] for r in con.execute(
            "SELECT DISTINCT user_id FROM "
            f"read_parquet('{args.src}/events.parquet') "
            f"ORDER BY user_id LIMIT {ZIPF_K}"
        ).fetchall()]
        head_orders = [r[0] for r in con.execute(
            "SELECT o_orderkey FROM "
            f"read_parquet('{args.src}/orders.parquet') "
            f"ORDER BY o_orderkey LIMIT {ZIPF_K}"
        ).fetchall()]
        head_tokens = [f"zqzipf{chr(ord('a') + i)}" for i in range(ZIPF_K)]
        transforms = {
            "events": f"""
                SELECT event_id, ts,
                       {bucket_case('event_id', head_users, 'user_id')}
                           AS user_id,
                       event_type, value, props
                FROM read_parquet('{args.src}/events.parquet')
            """,
            "lineitem": f"""
                SELECT {bucket_case('l_orderkey', head_orders,
                                    'l_orderkey')} AS l_orderkey,
                       l_partkey, l_suppkey, l_linenumber, l_quantity,
                       l_extendedprice, l_discount, l_tax, l_returnflag,
                       l_linestatus, l_shipdate
                FROM read_parquet('{args.src}/lineitem.parquet')
            """,
            "documents": f"""
                SELECT doc_id,
                       {bucket_case(
                           'doc_id',
                           [f"text || ' {t}'" for t in head_tokens],
                           'text')} AS text,
                       lang, source,
                       {bucket_case(
                           'doc_id',
                           [str(len(t) + 1) for t in head_tokens],
                           '0')} + n_chars AS n_chars
                FROM read_parquet('{args.src}/documents.parquet')
            """,
        }
        return run(con, args, transforms,
                   head_users=head_users, head_orders=head_orders,
                   head_tokens=head_tokens)

    hot_user, = con.execute(
        f"SELECT min(user_id) FROM read_parquet('{args.src}/events.parquet')"
    ).fetchone()
    hot_order, = con.execute(
        "SELECT min(o_orderkey) FROM "
        f"read_parquet('{args.src}/orders.parquet') WHERE o_orderkey % 10 = 3"
    ).fetchone()

    transforms = {
        "events": f"""
            SELECT event_id, ts,
                   CASE WHEN event_id % 5 = 0 THEN {hot_user}
                        ELSE user_id END AS user_id,
                   event_type, value, props
            FROM read_parquet('{args.src}/events.parquet')
        """,
        "lineitem": f"""
            SELECT CASE WHEN l_orderkey % 10 = 3 THEN {hot_order}
                        ELSE l_orderkey END AS l_orderkey,
                   l_partkey, l_suppkey, l_linenumber, l_quantity,
                   l_extendedprice, l_discount, l_tax, l_returnflag,
                   l_linestatus, l_shipdate
            FROM read_parquet('{args.src}/lineitem.parquet')
        """,
        "documents": f"""
            SELECT doc_id,
                   CASE WHEN doc_id % 10 < 3
                        THEN text || ' {HOT_TOKEN}' ELSE text END AS text,
                   lang, source,
                   CASE WHEN doc_id % 10 < 3
                        THEN n_chars + {len(HOT_TOKEN) + 1}
                        ELSE n_chars END AS n_chars
            FROM read_parquet('{args.src}/documents.parquet')
        """,
    }

    write_tables(con, args, transforms)

    # Evidence: the injected Zipf head, plus the invariants that must
    # survive the injection.
    u_n, u_hot = con.execute(f"""
        SELECT count(*),
               sum(CASE WHEN user_id = {hot_user} THEN 1 ELSE 0 END)
        FROM read_parquet('{args.out}/events.parquet')
    """).fetchone()
    o_n, o_hot = con.execute(f"""
        SELECT count(*),
               sum(CASE WHEN l_orderkey = {hot_order} THEN 1 ELSE 0 END)
        FROM read_parquet('{args.out}/lineitem.parquet')
    """).fetchone()
    d_n, d_hot = con.execute(f"""
        SELECT count(*),
               sum(CASE WHEN text LIKE '% {HOT_TOKEN}' THEN 1 ELSE 0 END)
        FROM read_parquet('{args.out}/documents.parquet')
    """).fetchone()
    print(f"hot user {hot_user}: {u_hot}/{u_n} events "
          f"({100.0 * u_hot / u_n:.1f}%)", flush=True)
    print(f"hot order {hot_order}: {o_hot}/{o_n} lineitems "
          f"({100.0 * o_hot / o_n:.1f}%)", flush=True)
    print(f"hot token '{HOT_TOKEN}': {d_hot}/{d_n} docs "
          f"({100.0 * d_hot / d_n:.1f}%)", flush=True)
    ok = (check_invariants(con, args.out)
          and u_hot * 5 >= u_n and o_hot * 12 >= o_n and d_hot * 4 >= d_n)
    return 0 if ok else 1


def check_invariants(con, out_dir: str) -> bool:
    """The fixture invariants BOTH probe variants must preserve:
    FK-valid lineitems, n_chars == length(text), collision-free
    subus_key fold. Shared so a new invariant can't drift between the
    single-key and --zipf paths (r12 review finding)."""
    dangling, = con.execute(f"""
        SELECT count(*) FROM read_parquet('{out_dir}/lineitem.parquet') li
        ANTI JOIN read_parquet('{out_dir}/orders.parquet') o
        ON li.l_orderkey = o.o_orderkey
    """).fetchone()
    nchars_bad, = con.execute(f"""
        SELECT count(*) FROM read_parquet('{out_dir}/documents.parquet')
        WHERE n_chars <> length(text)
    """).fetchone()
    sub_n, sub_d = con.execute(
        "SELECT count(*), count(DISTINCT epoch_us(ts) * 100 + event_id % 100)"
        f" FROM read_parquet('{out_dir}/events.parquet')"
    ).fetchone()
    print(f"dangling lineitem FKs: {dangling}", flush=True)
    print(f"n_chars<>length(text) rows: {nchars_bad}", flush=True)
    print(f"subus_key uniqueness: {sub_n} rows, {sub_d} keys", flush=True)
    return dangling == 0 and nchars_bad == 0 and sub_n == sub_d


def write_tables(con, args, transforms) -> None:
    for table in COPIED + tuple(transforms):
        src = f"{args.src}/{table}.parquet"
        dst = f"{args.out}/{table}.parquet"
        if os.path.exists(dst):
            print(f"skip {table}: exists", flush=True)
            continue
        if table in COPIED:
            shutil.copyfile(src, dst)
            print(f"copied {table}", flush=True)
        else:
            con.execute(f"COPY ({transforms[table]}) TO '{dst}' "
                        "(FORMAT PARQUET)")
            n, = con.execute(
                f"SELECT count(*) FROM read_parquet('{dst}')"
            ).fetchone()
            print(f"wrote {table}: {n} rows", flush=True)


def run(con, args, transforms, head_users, head_orders,
        head_tokens) -> int:
    """Write the --zipf variant and print its head profile + the same
    fixture invariants the single-key probe asserts."""
    write_tables(con, args, transforms)

    user_shares = [r for r in con.execute(f"""
        SELECT user_id, count(*) AS n,
               100.0 * count(*) / sum(count(*)) OVER () AS pct
        FROM read_parquet('{args.out}/events.parquet')
        GROUP BY user_id ORDER BY n DESC LIMIT {ZIPF_K}
    """).fetchall()]
    order_shares = [r for r in con.execute(f"""
        SELECT l_orderkey, count(*) AS n,
               100.0 * count(*) / sum(count(*)) OVER () AS pct
        FROM read_parquet('{args.out}/lineitem.parquet')
        GROUP BY l_orderkey ORDER BY n DESC LIMIT {ZIPF_K}
    """).fetchall()]
    tok_pred = " + ".join(
        f"sum(CASE WHEN text LIKE '% {t}' THEN 1 ELSE 0 END)"
        for t in head_tokens
    )
    d_n, d_hot, d_top = con.execute(f"""
        SELECT count(*), {tok_pred},
               sum(CASE WHEN text LIKE '% {head_tokens[0]}'
                   THEN 1 ELSE 0 END)
        FROM read_parquet('{args.out}/documents.parquet')
    """).fetchone()
    head_set = set(head_users)
    u_head_pct = sum(p for u, _, p in user_shares if u in head_set)
    o_head_pct = sum(p for o, _, p in order_shares if o in set(head_orders))
    print("zipf head users (top-5 shown): "
          + ", ".join(f"{u}={p:.2f}%" for u, _, p in user_shares[:5])
          + f"; head-20 total {u_head_pct:.1f}%", flush=True)
    print("zipf head orders (top-5 shown): "
          + ", ".join(f"{o}={p:.2f}%" for o, _, p in order_shares[:5])
          + f"; head-20 total {o_head_pct:.1f}%", flush=True)
    print(f"zipf head tokens: {d_hot}/{d_n} docs carry one "
          f"({100.0 * d_hot / d_n:.1f}%), top token df "
          f"{100.0 * d_top / d_n:.2f}%", flush=True)
    # head must be a real Zipf HEAD: 20 keys ~35% total, top ~10%, and
    # NO single dominant key (top < 12% — the single-key probe's regime)
    top_u_pct = user_shares[0][2]
    ok = (check_invariants(con, args.out)
          and 30.0 <= u_head_pct <= 40.0 and 30.0 <= o_head_pct <= 42.0
          and 7.0 <= top_u_pct <= 12.0
          and 30.0 <= 100.0 * d_hot / d_n <= 40.0)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
