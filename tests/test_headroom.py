"""Mechanical int64-grid headroom gate (VERDICT r8 "What's wrong" #3).

Every ``exact_sum``/``exact_avg`` call site accumulates per-row
``floor(term * 10^dp + 0.5)`` into an int64, whose contract is
|term| * 10^dp * rows_in_group < 2^63. Until r9 that bound lived only
in comments — an overflow at a new SF would be a silent wrong sum on
BOTH engines (bit-identical, and identically wrong). This module makes
it mechanical:

1. **Completeness** — an AST walk over the package discovers every
   call site; each must have a ``HEADROOM_REGISTRY`` entry (keyed by
   (file, helper, normalized-first-arg-source, dp)) and vice versa. A
   NEW call site without a registry entry fails here, as does a stale
   entry after a refactor.
2. **Margin** — per entry, a DuckDB probe observes the site's
   max|term| and worst-group row count at the LARGEST generated
   fixture (sf0.1), and the product max|term| * 10^dp * rows must sit
   >= 3 orders of magnitude under 2^63. Claimed (static) bounds are
   used only where the term is provably range-limited (ratios in
   [0,1], sMAPE in [0,2]); everything else is observed.

Escalation path when a site nears the bound: DECIMAL(38,0)
accumulation (the q_logistic_irls / functions.dsum2 pattern).
"""

from __future__ import annotations

import ast
import os

import pytest

from hadoop_log_analysis_spark.oracle import duckdb_connection

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "hadoop_log_analysis_spark")
PROBE_SF = os.environ.get("HLA_HEADROOM_SF", "/root/testdata/sf0.1")
TWO63 = 2.0**63
MARGIN = 1e3  # require >= 3 orders of magnitude headroom at fixture scale

# Worst-group row-count probes, shared across entries. Each returns one
# row (rows,). Group keys mirror the call site's groupBy.
_ROWS_BY_LANG = ("SELECT max(cnt) FROM (SELECT count(*) AS cnt "
                 "FROM documents GROUP BY lang) g")
_ROWS_BY_SOURCE = ("SELECT max(cnt) FROM (SELECT count(*) AS cnt "
                   "FROM documents GROUP BY source) g")
_ROWS_ALL_DOCS = "SELECT count(*) FROM documents"
_MAX_TOKENS_PER_DOC = ("SELECT max(len(string_split(text, ' '))) "
                       "FROM documents")

# Registry: (relpath, helper, normalized arg source, dp) ->
#   term_sql: probe for max|term| (None -> use static term_bound only)
#   term_bound: static claim when the term is range-limited by algebra
#   rows_sql: probe for the worst accumulation-group row count
HEADROOM_REGISTRY = {
    # q_winsorized_stats: value clamped to [p05, p95] -> |term| <=
    # max|value|; escalated to the DECIMAL(38,0) _wide tier in r11
    # (was the registry's tightest int64 margin, ~sf80)
    ("queries/advanced.py", "exact_avg_wide", 'clipped', 6): {
        "term_sql": "SELECT max(abs(value)) FROM events",
        "rows_sql": ("SELECT max(cnt) FROM (SELECT count(*) AS cnt "
                     "FROM events GROUP BY event_type) g"),
    },
    # q_stl_decompose: |n - trend(7-day avg)| <= max daily-dow count
    ("queries/analytics_q.py", "exact_avg", 'F.col("n") - F.col("trend")', 6): {
        "term_sql": ("SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM events "
                     "GROUP BY date_trunc('day', ts), dayofweek(ts)) g"),
        "rows_sql": ("SELECT count(*) FROM (SELECT DISTINCT "
                     "date_trunc('day', ts) FROM events) d"),
    },
    # q_seasonal_naive_error: sMAPE term 2|x-y|/(x+y) in [0, 2] (counts >= 1)
    ("queries/analytics_q.py", "exact_avg",
     'F.abs(F.col("n") - F.col("n_pred")) * 2.0 / (F.col("n") + F.col("n_pred"))', 6): {
        "term_bound": 2.0,
        "rows_sql": ("SELECT max(cnt) FROM (SELECT event_type, count(*) AS cnt "
                     "FROM (SELECT event_type, date_trunc('day', ts) AS d "
                     "FROM events GROUP BY 1, 2) s GROUP BY event_type) g"),
    },
    # q_linear_attribution: |value / n_touch| <= max|value|; worst channel
    # group = matched (purchase, touch) pairs within the 24 h window
    ("queries/analytics_q.py", "exact_sum",
     'F.col("value") * 1.0 / F.col("n_touch")', 6): {
        "term_sql": "SELECT max(abs(value)) FROM events",
        "rows_sql": ("SELECT max(cnt) FROM (SELECT t.event_type, count(*) AS cnt "
                     "FROM events p JOIN events t ON t.user_id = p.user_id "
                     "AND t.event_type IN ('click', 'view') "
                     "AND p.event_type = 'purchase' AND t.ts < p.ts "
                     "AND t.ts >= p.ts - INTERVAL 24 HOUR "
                     "GROUP BY t.event_type) g"),
    },
    # q_decayed_user_score: |value * exp(-0.05 age)| <= max|value|; per-user
    ("queries/analytics_q.py", "exact_sum",
     'F.col("value") * F.exp(-0.05 * age_days)', 6): {
        "term_sql": "SELECT max(abs(value)) FROM events",
        "rows_sql": ("SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM events "
                     "WHERE event_type IN ('click', 'purchase') "
                     "GROUP BY user_id) g"),
    },
    # q_char_entropy_filter: Shannon entropy <= log2(distinct chars) <= 16
    ("queries/curation_q.py", "exact_avg", '"h"', 4): {
        "term_bound": 16.0,
        "rows_sql": _ROWS_BY_LANG,
    },
    # q_eval_contamination: shingle-overlap ratio in [0, 1]
    ("queries/curation_q.py", "exact_avg", 'overlap', 6): {
        "term_bound": 1.0,
        "rows_sql": _ROWS_BY_SOURCE,
    },
    # q_rec_eval: n_brands <= k_actual -> ratio in (0, 1]
    ("queries/graph_q.py", "exact_avg",
     'F.col("n_brands") * 1.0 / F.col("k_actual")', 6): {
        "term_bound": 1.0,
        "rows_sql": "SELECT count(*) FROM customer",
    },
    # q_rake_keywords: per-word degree/freq score <= max words in any
    # phrase <= max tokens in any doc; group = words per phrase (same cap)
    ("queries/llm_ops.py", "exact_sum", '"score"', 6): {
        "term_sql": _MAX_TOKENS_PER_DOC,
        "rows_sql": _MAX_TOKENS_PER_DOC,
    },
    # q_bigram_lm_score: NLL = ln(na/nab) <= ln(total bigram occurrences)
    ("queries/llm_ops.py", "exact_avg",
     'F.log(F.col("na").cast("double") / F.col("nab"))', 6): {
        "term_sql": ("SELECT ln(sum(greatest(len(string_split(text, ' ')) - 1, 1)))"
                     " FROM documents"),
        "rows_sql": _MAX_TOKENS_PER_DOC,
    },
    # q_audio_inventory: duration_ms = data_bytes*1000/byte_rate,
    # byte_rate >= 16000 -> <= utf8 length / 16
    ("queries/llm_ops.py", "exact_sum", 'F.col("duration_ms")', 6): {
        "term_sql": ("SELECT max(octet_length(encode(text))) / 16.0 "
                     "FROM documents"),
        "rows_sql": _ROWS_ALL_DOCS,
    },
    # q_script_mix: character-class fractions in [0, 1]
    ("queries/llm_ops.py", "exact_avg", '"latin_frac"', 4): {
        "term_bound": 1.0, "rows_sql": _ROWS_BY_LANG,
    },
    ("queries/llm_ops.py", "exact_avg", '"digit_frac"', 4): {
        "term_bound": 1.0, "rows_sql": _ROWS_BY_LANG,
    },
    ("queries/llm_ops.py", "exact_avg", '"nonascii_frac"', 4): {
        "term_bound": 1.0, "rows_sql": _ROWS_BY_LANG,
    },
    # q_silhouette_simplified: silhouette coefficient in [-1, 1]
    ("queries/llm_ops.py", "exact_avg", '"s"', 6): {
        "term_bound": 1.0,
        "rows_sql": "SELECT count(*) FROM embeddings",
    },
    # q_embedding_outliers centroid mean (r10 sf1-probe fix): one
    # embedding component per row; group = vectors per label
    ("queries/llm_ops.py", "exact_avg", 'F.col("x")', 7): {
        "term_sql": ("SELECT max(abs(v)) FROM (SELECT unnest(embedding) "
                     "AS v FROM embeddings) u"),
        "rows_sql": ("SELECT max(cnt) FROM (SELECT count(*) AS cnt "
                     "FROM embeddings GROUP BY label) g"),
    },
    # q_embedding_quantize: |x - dequant| <= component range; group = dims
    ("queries/pipeline_q.py", "exact_avg", 'F.abs(F.col("x") - dequant)', 8): {
        "term_sql": ("SELECT 2 * max(abs(v)) FROM (SELECT unnest(embedding) "
                     "AS v FROM embeddings) u"),
        "rows_sql": "SELECT max(len(embedding)) FROM embeddings",
    },
    # q_bm25 / q_hybrid_retrieval: term_score <= idf_max * (k1+1) <=
    # (ln(n_docs + 1) + 1) * 2.2 -- ln(n_docs) dominates; group = terms/doc
    ("queries/pipeline_q.py", "exact_sum", '"term_score"', 6): {
        "term_sql": ("SELECT (ln(count(*) + 1) + 1) * 2.2 FROM documents"),
        "rows_sql": _MAX_TOKENS_PER_DOC,
    },
    ("queries/pipeline_q.py", "exact_sum", '"ts_"', 6): {
        "term_sql": ("SELECT (ln(count(*) + 1) + 1) * 2.2 FROM documents"),
        "rows_sql": _MAX_TOKENS_PER_DOC,
    },
    # q_try_divide: price/discount ratios reach ~1.05e7, and at dp=4
    # over 3e5-row groups the int64 product is 3.2e16 — within 300x of
    # 2^63, which is exactly why this site uses exact_avg_WIDE
    # (DECIMAL(38,0) accumulation; bound 1e38, margin ~1e21). The
    # first site this gate escalated.
    ("queries/aggregates.py", "exact_avg_wide", 'ratio', 4): {
        "term_sql": ("SELECT max(l_extendedprice / l_discount) "
                     "FROM lineitem WHERE l_discount <> 0"),
        "rows_sql": ("SELECT max(cnt) FROM (SELECT count(*) AS cnt "
                     "FROM lineitem GROUP BY l_linestatus) g"),
    },
    # --- inline grid-pin sums (the shapes the helpers can't express
    # because the caller keeps the grid integer or windows over it) ---
    # q_hhi_concentration: share^2 in [0, 1]; group = segment suppliers
    ("queries/aggregates.py", "inline_sum",
     'F.sum( F.floor( F.pow(F.col("share"), 2) * F.lit(100000000.0) + F.lit(0.', 8): {
        "term_bound": 1.0,
        "rows_sql": "SELECT count(*) FROM supplier",
    },
    # q_cusum_shift: |n - mu - k*sd| <= ~2x max hourly count; windowed
    # cumulation over the hourly calendar
    ("queries/analytics_q.py", "inline_sum",
     'F.sum( F.floor(term * F.lit(1000000.0) + F.lit(0.5)).cast("long") )', 6): {
        "term_sql": ("SELECT 2 * max(cnt) FROM (SELECT count(*) AS cnt "
                     "FROM events GROUP BY date_trunc('hour', ts)) g"),
        "rows_sql": ("SELECT count(DISTINCT date_trunc('hour', ts)) "
                     "FROM events"),
    },
    # q_char_entropy_filter: |p*log2(p)| <= 1/(e*ln2) ~ 0.531; group =
    # per-doc alphabet (<= 256 distinct chars)
    ("queries/curation_q.py", "inline_sum",
     'F.sum( F.floor( p * F.log2(p) * F.lit(100000000.0) + F.lit(0.5) ).cast("', 8): {
        "term_bound": 0.54,
        "rows_sql": "SELECT 256",
    },
    # q_chi2_independence: max observed (obs-exp)^2/exp cell stat;
    # group = |langs| x |sources| contingency cells
    ("queries/governance_q.py", "inline_sum",
     'F.sum( F.floor( (d * d / F.col("exp")) * F.lit(1000000.0) + F.lit(0.5) )', 6): {
        "term_sql": ("""
            WITH o AS (SELECT lang, source, count(*) AS obs
                       FROM documents GROUP BY 1, 2),
            r AS (SELECT lang, sum(obs) AS rn FROM o GROUP BY lang),
            c AS (SELECT source, sum(obs) AS cn FROM o GROUP BY source),
            t AS (SELECT sum(obs) AS t FROM o)
            SELECT max(pow(coalesce(o.obs, 0) - r.rn * c.cn / t.t, 2)
                       / (r.rn * c.cn / t.t))
            FROM r CROSS JOIN c CROSS JOIN t
            LEFT JOIN o ON o.lang = r.lang AND o.source = c.source"""),
        "rows_sql": ("SELECT count(DISTINCT lang) * count(DISTINCT source) "
                     "FROM documents"),
    },
    # q_ks_drift PSI term: |(pc-pr) ln(pc/pr)| with Laplace-smoothed
    # probabilities -> bounded by ~|ln(smallest smoothed p)| ~ 20
    ("queries/governance_q.py", "inline_sum",
     'F.sum( F.floor( (pc - pr) * F.log(pc / pr) * F.lit(100000000.0) + F.lit(', 8): {
        "term_bound": 32.0,
        "rows_sql": "SELECT 10",  # fixed 10-bin grid per event_type
    },
    # q_quality_gate_gains: entropy e <= log2(|alphabet|) <= 16;
    # group = docs per tier
    ("queries/governance_q.py", "inline_sum",
     'F.sum( F.floor( F.col("e") * F.lit(1000000.0) + F.lit(0.5) ).cast("long"', 6): {
        "term_bound": 16.0,
        "rows_sql": _ROWS_ALL_DOCS,
    },
    # q_calibration_bins: sigmoid score in [0, 1]; group = docs per bin
    ("queries/governance_q.py", "inline_sum",
     'F.sum( F.floor( F.col("score") * F.lit(100000000.0) + F.lit(0.5) ).cast(', 8): {
        "term_bound": 1.0,
        "rows_sql": _ROWS_ALL_DOCS,
    },
    # q_brier_score: (score - y)^2 in [0, 1]; global over docs
    ("queries/governance_q.py", "inline_sum",
     'F.sum( F.floor(sq * F.lit(100000000.0) + F.lit(0.5)).cast("long") )', 8): {
        "term_bound": 1.0,
        "rows_sql": _ROWS_ALL_DOCS,
    },
    # q_anova_doclen between-group term n*(mean - grand_mean)^2
    ("queries/governance_q.py", "inline_sum",
     'F.sum( F.floor(ssb_t * F.lit(10000.0) + F.lit(0.5)).cast("long") )', 4): {
        "term_sql": ("""
            WITH g AS (SELECT source, count(*) AS n, sum(n_chars) AS s1
                       FROM documents GROUP BY source),
            a AS (SELECT sum(s1) * 1.0 / sum(n) AS gm FROM g)
            SELECT max(n * pow(s1 * 1.0 / n - gm, 2)) FROM g, a"""),
        "rows_sql": "SELECT count(DISTINCT source) FROM documents",
    },
    # q_log_loss: per-doc loss <= ln(1+exp(|z|)) ~ |z|+1,
    # z = (n_chars - 300)/100
    ("queries/governance_q.py", "inline_sum",
     'F.sum( F.floor(term * F.lit(100000000.0) + F.lit(0.5)).cast("long") )', 8): {
        "term_sql": ("SELECT max(abs(n_chars - 300.0)) / 100.0 + 1 "
                     "FROM documents"),
        "rows_sql": _ROWS_ALL_DOCS,
    },
    # q_anova_doclen within-group subtrahend s1^2/n (grows ~linearly
    # with docs/source — the closest non-wide site to the margin; the
    # gate is the tripwire that forces DECIMAL escalation at larger SF)
    ("queries/governance_q.py", "inline_sum",
     'F.sum( F.floor(with_t * F.lit(10000.0) + F.lit(0.5)).cast("long") )', 4): {
        "term_sql": ("SELECT max(pow(s1, 2) * 1.0 / n) FROM "
                     "(SELECT count(*) AS n, sum(n_chars) AS s1 "
                     "FROM documents GROUP BY source) g"),
        "rows_sql": "SELECT count(DISTINCT source) FROM documents",
    },
}


import math
import re


def _inline_dp(segment: str) -> int | None:
    """Grid exponent of an inline pin: the largest F.lit(10^k) in the
    expression (the +0.5 rounding literal is < 10 and ignored)."""
    gs = [float(m) for m in re.findall(r"F\.lit\((\d+(?:\.\d+)?)\)", segment)]
    gs = [g for g in gs if g >= 10]
    if not gs:
        return None
    return round(math.log10(max(gs)))


def discover_call_sites() -> set[tuple[str, str, str, int]]:
    """AST-walk the package for every int64 grid accumulation: calls to
    the exact_sum/exact_avg helper family PLUS inline
    ``F.sum(F.floor(term * lit(g) + 0.5).cast("long"))`` shapes (the
    form the helpers can't express because the caller keeps the grid
    integer — q_cusum_shift's windowed cumulation, chi-square's display
    division). Inline sites key on the normalized source prefix, so
    editing the term forces a registry touch."""
    sites = set()
    for dirpath, _, files in os.walk(PKG):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, PKG)
            if rel == os.path.join("functions", "__init__.py"):
                continue  # the definitions themselves
            src = open(path).read()
            for node in ast.walk(ast.parse(src)):
                if not isinstance(node, ast.Call):
                    continue
                name = getattr(node.func, "id",
                               getattr(node.func, "attr", ""))
                if name in ("exact_sum", "exact_avg", "exact_avg_wide"):
                    arg = " ".join(
                        ast.get_source_segment(src, node.args[0]).split()
                    )
                    dp = node.args[1].value
                    sites.add((rel.replace(os.sep, "/"), name, arg, dp))
                elif name == "sum":
                    seg = " ".join(
                        (ast.get_source_segment(src, node) or "").split()
                    )
                    if "floor(" in seg and '.cast("long")' in seg:
                        dp = _inline_dp(seg)
                        if dp is not None:
                            sites.add(
                                (rel.replace(os.sep, "/"), "inline_sum",
                                 seg[:72], dp)
                            )
    return sites


def test_registry_is_complete_and_current():
    """Every call site registered; every entry matches a live site."""
    sites = discover_call_sites()
    registered = set(HEADROOM_REGISTRY)
    missing = sites - registered
    stale = registered - sites
    assert not missing, (
        "exact_sum/exact_avg call sites without a HEADROOM_REGISTRY "
        f"entry (add one with a term/rows probe): {sorted(missing)}"
    )
    assert not stale, f"stale HEADROOM_REGISTRY entries: {sorted(stale)}"


@pytest.mark.parametrize(
    "key", sorted(HEADROOM_REGISTRY), ids=lambda k: f"{k[0]}:{k[2][:30]}"
)
def test_fixture_scale_headroom(key):
    """max|term| * 10^dp * worst-group rows >= 3 orders under 2^63."""
    entry = HEADROOM_REGISTRY[key]
    _, helper, _, dp = key
    # _wide helpers accumulate in DECIMAL(38,0): their bound is 1e38,
    # not 2^63 (DuckDB's HUGEINT matches — see functions.exact_avg_wide)
    limit = 1e38 if helper.endswith("_wide") else TWO63
    con = duckdb_connection(PROBE_SF)
    try:
        if entry.get("term_sql"):
            term = float(con.execute(entry["term_sql"]).fetchone()[0])
            claimed = entry.get("term_bound")
            if claimed is not None:
                assert term <= claimed, (
                    f"{key}: observed max|term| {term} exceeds the "
                    f"registered claim {claimed}"
                )
        else:
            term = float(entry["term_bound"])
        rows = float(con.execute(entry["rows_sql"]).fetchone()[0])
    finally:
        con.close()
    # the PER-ROW grid value must be exactly representable in double
    # (floor computes in double on BOTH engines before any cast): a
    # term*10^dp past 2^53 quantizes identically-but-wrongly on both
    # sides — consistent, yet no longer the grid the comment promises
    per_row = term * (10.0**dp)
    assert per_row < 2.0**53 / 10, (
        f"{key}: per-row grid value {per_row:.3g} nears 2^53 — the "
        "double floor is no longer integer-exact; lower dp"
    )
    product = per_row * rows
    assert product < limit / MARGIN, (
        f"{key}: |term|*10^dp*rows = {term:.3g} * 1e{dp} * {rows:.3g} = "
        f"{product:.3g} is within {MARGIN:.0e} of the accumulator bound "
        f"{limit:.3g} — escalate this site to DECIMAL(38,0) accumulation "
        "(functions.exact_avg_wide / dsum2 pattern)"
    )


# --- 2-dp money emission audit (r10, sf1-probe finding #1; r11:
# migrated) --- money_sum now emits through dec_sum_double (integer
# significand accumulated in DECIMAL(38,0)/HUGEINT, ONE int->double
# conversion, one division — identical machine ops on both engines at
# any scale), so the 2^53 cast cliff the r10 audit watched is retired
# for every money_sum site. The audit now asserts the NEW path's
# bound: the DECIMAL(38,0) significand accumulator must stay orders
# under 1e38. Rather than per-site probes, bound every site
# CONSERVATIVELY by its source column's whole-table absolute mass —
# any filter/group only shrinks a site's sum, so sum(abs(col)) * 100
# is an upper bound for every money_sum over that column. Derived
# columns map to the bound of their worst-case row multiplicity times
# the source column.
MONEY_SUM_SOURCES = {
    # column literal in a money_sum(...) call -> (probe SQL for the
    # whole-table absolute mass of the 2-dp source)
    "c_acctbal": "SELECT sum(abs(c_acctbal)) FROM customer",
    "s_acctbal": "SELECT sum(abs(s_acctbal)) FROM supplier",
    "o_totalprice": "SELECT sum(abs(o_totalprice)) FROM orders",
    "l_extendedprice": "SELECT sum(abs(l_extendedprice)) FROM lineitem",
    "l_quantity": "SELECT sum(abs(l_quantity)) FROM lineitem",
    "value": "SELECT sum(abs(value)) FROM events",
    # q_asof_by_user carries one prior-purchase value per event row:
    # bound = |events| * max|value|
    "prior_purchase": "SELECT count(*) * max(abs(value)) FROM events",
    # q_locf_fill forward-fills one value per event row (r11:
    # site migrated from a hand-rolled one-step emission to money_sum)
    "carried": "SELECT count(*) * max(abs(value)) FROM events",
    # q_column_stats' loop applies money_sum to each of l_quantity /
    # l_discount / l_extendedprice; l_extendedprice's mass dominates
    "<dynamic:queries/scale_q.py>":
        "SELECT sum(abs(l_extendedprice)) FROM lineitem",
}


def discover_money_sum_columns() -> set[str]:
    cols = set()
    for dirpath, _, files in os.walk(PKG):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, PKG)
            if rel == os.path.join("functions", "__init__.py"):
                continue
            src = open(path).read()
            for node in ast.walk(ast.parse(src)):
                if (
                    isinstance(node, ast.Call)
                    and getattr(node.func, "id",
                                getattr(node.func, "attr", ""))
                    == "money_sum"
                ):
                    arg = node.args[0]
                    if isinstance(arg, ast.Constant) and isinstance(
                        arg.value, str
                    ):
                        cols.add(arg.value)
                    else:
                        # non-literal arg: the site registers under a
                        # per-file sentinel with a dominating bound
                        cols.add(
                            f"<dynamic:{rel.replace(os.sep, '/')}>"
                        )
    return cols


def test_money_sum_sites_are_all_audited():
    cols = discover_money_sum_columns()
    missing = cols - set(MONEY_SUM_SOURCES)
    assert not missing, (
        f"money_sum columns without a MONEY_SUM_SOURCES bound: {missing}"
    )


@pytest.mark.parametrize("col", sorted(MONEY_SUM_SOURCES))
def test_money_sum_significand_headroom(col):
    """sum(abs(col)) * 100 (the worst any money_sum site over this
    column can reach) must sit >= 3 orders under the DECIMAL(38,0)
    accumulator bound at the probe SF. money_sum emits through
    dec_sum_double since r11, so the old 2^53 cast cliff (engines'
    decimal->double casts diverging at ~sf300) is retired; what
    remains is the exact-integer accumulator's own ~1e38 ceiling —
    astronomically far (a 2-dp money mass of 1e36 is ~1e13 x the
    global economy), asserted anyway so the audit stays mechanical."""
    con = duckdb_connection(PROBE_SF)
    try:
        mass = float(con.execute(MONEY_SUM_SOURCES[col]).fetchone()[0])
    finally:
        con.close()
    significand = mass * 100.0
    assert significand < 1e38 / MARGIN, (
        f"money_sum({col!r}): worst-case significand {significand:.3g} "
        "nears DECIMAL(38,0) — escalate the accumulator precision"
    )


def test_money_sum_is_two_step_emission(spark):
    """Pin the migration itself: money_sum must route through
    dec_sum_double's two-step emission (sum of DECIMAL(38,0) grid
    integers, then ONE double division) — a regression to
    ``F.sum(decimal).cast("double")`` would silently re-open the 2^53
    one-step-cast divergence the sf1 probe falsified."""
    from pyspark.sql import functions as F

    from hadoop_log_analysis_spark.functions import money_sum

    df = spark.range(1).select(
        money_sum(F.col("id").cast("double")).alias("s")
    )
    plan = df._jdf.queryExecution().analyzed().toString().lower()
    assert "decimal(38,0)" in plan, plan
    assert "/ 100.0" in plan, plan


def test_no_zero_norm_embeddings():
    """Precondition gate for the cosine tier (r11): operators/
    similarity.cosine divides by norm(a)*norm(b); a zero-norm vector
    yields NaN, and Spark ORDERS NaN ABOVE every double — a zero
    vector would rank FIRST in any cosine top-k, silently. Rather than
    hide the hazard behind a per-row guard that the inline DuckDB
    oracle mirrors would each have to replicate (and could typo-drift
    on), the repo asserts the regime out of the data contract the way
    subus_key uniqueness and the money-significand audit do: the
    corpus must contain no zero-norm (or NULL/empty) embedding at the
    probe SF. A pipeline ingesting vectors that can be zero must
    filter them upstream (the curation tier's job) or extend cosine
    AND every oracle mirror with the sim:=0 convention in one change.
    """
    con = duckdb_connection(PROBE_SF)
    try:
        # r12 (ADVICE r11): also flag NULL/NaN ELEMENTS — a NULL element
        # makes the squared sum NULL (so `NOT sum > 0` is NULL and the
        # row slipped past the r11 predicate), a NaN element makes it
        # NaN (which DuckDB orders ABOVE 0, so `sum > 0` was true) —
        # yet both produce non-finite cosine in Spark, the exact
        # NaN-sorts-first hazard this gate exists to exclude.
        n_bad, = con.execute(
            "SELECT count(*) FROM embeddings WHERE embedding IS NULL "
            "OR len(embedding) = 0 OR NOT list_aggregate("
            "list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum') > 0 "
            "OR len(list_filter(embedding, "
            "x -> x IS NULL OR isnan(CAST(x AS DOUBLE)))) > 0"
        ).fetchone()
    finally:
        con.close()
    assert n_bad == 0, f"{n_bad} zero-norm embeddings violate the cosine contract"
