"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in kafka_es_ray) calls ray.init()/ray.shutdown().

Each queries() entry is one operator/pipeline from SURVEY.md §2 plus the
training-data operator families; oracle_sql() carries the DuckDB-
equivalent SQL for every SQL-expressible one (same column names, floats
rounded to 6dp on both sides before comparison).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np

SF_SMOKE = "/root/testdata/sf0.001"

# Tokenizer expression — EXACTLY analyzer ascii_v1
# (tests/test_tokenizer.py::test_duckdb_parity).
_TOK = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"

# BM25 pieces (k1=1.2, b=0.75 — query/bm25.py determinism contract)
_BM25_SQL_TEMPLATE = """
WITH dl AS (
  SELECT doc_id, len({_TOK})::DOUBLE AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
),
toks AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
df AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1
),
ranked_terms AS (
  SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df
),
queries AS (
  SELECT 0 AS query_id, term FROM ranked_terms WHERE r = 1
  UNION ALL SELECT 1, term FROM ranked_terms WHERE r IN (2, 3)
  UNION ALL SELECT 2, term FROM ranked_terms WHERE r IN (4, 5, 6)
  UNION ALL SELECT 3, term FROM ranked_terms WHERE r IN (7, 8)
),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum(
           ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
         ) AS raw_score
  FROM queries q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
  {having}
),
topk AS (
  SELECT query_id, doc_id, round(raw_score, 6) AS score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(raw_score, 6) DESC, doc_id ASC
         ) AS rank
  FROM scores
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM topk WHERE rank <= 10
"""

_BM25_SQL = _BM25_SQL_TEMPLATE.replace("{_TOK}", _TOK).format(having="")

# Everything through the ranked ``topk`` CTE — the shared head for
# oracles that post-process the top-k rows (highlight).
_BM25_TOPK_HEAD = _BM25_SQL[: _BM25_SQL.rindex("SELECT query_id,")].rstrip()

# ES highlighter oracle: replays engine.make_snippet exactly.  The
# documents text alphabet is [a-z ] (single-space token separation), so
# the python pattern's (?<![a-z0-9])/(?![a-z0-9]) whole-token boundaries
# reduce to space-or-edge — instr on the space-padded text gives the
# first whole-token occurrence, and <em>-wrapping is a space-delimited
# regexp_replace run TWICE (RE2 replacements consume the shared
# delimiter of adjacent matches; the second pass catches the survivors
# — python lookarounds don't consume, one pass suffices there).
_HIGHLIGHT_SQL = _BM25_TOPK_HEAD + r""",
qterms AS (
  SELECT query_id, string_agg(term, '|' ORDER BY term) AS alts
  FROM queries GROUP BY 1
),
pos AS (
  SELECT t.query_id, t.doc_id, t.rank, t.score, d.text, q.term,
         instr(' ' || d.text || ' ', ' ' || q.term || ' ') AS ip
  FROM topk t JOIN documents d USING (doc_id) JOIN queries q USING (query_id)
  WHERE t.rank <= 10
),
firstpos AS (
  SELECT query_id, doc_id, rank, score, text,
         min(CASE WHEN ip > 0 THEN ip END) AS p
  FROM pos GROUP BY 1, 2, 3, 4, 5
),
firstterm AS (
  SELECT fp.query_id, fp.doc_id, fp.rank, fp.score, fp.text, fp.p,
         min(p2.term) AS term0
  FROM firstpos fp JOIN pos p2
    ON p2.query_id = fp.query_id AND p2.doc_id = fp.doc_id AND p2.ip = fp.p
  GROUP BY 1, 2, 3, 4, 5, 6
),
snip AS (
  SELECT query_id, doc_id, rank, score, text,
         greatest(0, p - 1 - 60) AS lo,
         least(len(text), p - 1 + len(term0) + 60) AS hi
  FROM firstterm
),
wrapped AS (
  SELECT s.query_id, s.doc_id, s.rank, s.score, s.lo, s.hi,
         len(s.text) AS tl,
         regexp_replace(
           regexp_replace(
             ' ' || substr(s.text, s.lo + 1, s.hi - s.lo) || ' ',
             '( )(' || qt.alts || ')( )', '\1<em>\2</em>\3', 'g'),
           '( )(' || qt.alts || ')( )', '\1<em>\2</em>\3', 'g') AS w
  FROM snip s JOIN qterms qt USING (query_id)
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score,
       (CASE WHEN lo > 0 THEN '...' ELSE '' END)
       || substr(w, 2, len(w) - 2)
       || (CASE WHEN hi < tl THEN '...' ELSE '' END) AS highlight
FROM wrapped
"""


def _terminate_after_sql() -> str:
    """_count with terminate_after=5, per-SEGMENT cap.  SQL can replay
    the cap because the index is routing-partitioned on doc_id % 8 (see
    _q_terminate_after_count) and the fixed routing-value -> partition
    map (the engine's public route_partition contract over the eight
    routing strings) is inlined as a VALUES table — partition membership
    is then pure SQL arithmetic."""
    from kafka_es_ray.functions.hashing import route_partition

    pmap = route_partition(
        np.array([str(i) for i in range(8)], dtype=object), 8
    )
    vals = ", ".join(f"({i}, {int(p)})" for i, p in enumerate(pmap))
    return f"""
WITH routing_map(grp, part) AS (VALUES {vals}),
toks AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
df0 AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM toks GROUP BY 1),
ranked_terms AS (
  SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df0
),
queries AS (
  SELECT 0 AS query_id, term FROM ranked_terms WHERE r = 1
  UNION ALL SELECT 1, term FROM ranked_terms WHERE r IN (2, 3)
  UNION ALL SELECT 2, term FROM ranked_terms WHERE r IN (4, 5, 6)
  UNION ALL SELECT 3, term FROM ranked_terms WHERE r IN (7, 8)
  UNION ALL SELECT 4, 'zzzabsentterm'
),
docs_part AS (
  SELECT d.doc_id, rm.part FROM documents d
  JOIN routing_map rm ON d.doc_id % 8 = rm.grp
),
matches AS (
  SELECT DISTINCT q.query_id, t.doc_id
  FROM queries q JOIN toks t ON t.term = q.term
),
per_part AS (
  SELECT m.query_id, dp.part, count(*) AS c
  FROM matches m JOIN docs_part dp USING (doc_id) GROUP BY 1, 2
),
agg AS (
  SELECT query_id, sum(least(c, 5))::BIGINT AS n_matching,
         bool_or(c >= 5) AS terminated_early
  FROM per_part GROUP BY 1
)
SELECT q.query_id, coalesce(a.n_matching, 0)::BIGINT AS n_matching,
       coalesce(a.terminated_early, FALSE) AS terminated_early
FROM (SELECT DISTINCT query_id FROM queries) q LEFT JOIN agg a USING (query_id)
ORDER BY query_id
"""
# numeric range filter: same scores, docs outside [150, 400] n_chars are
# dropped BEFORE ranking (ES filter context: no score contribution)
_RANGE_SQL = _BM25_SQL.replace(
    "  FROM scores\n)",
    "  FROM scores JOIN documents d USING (doc_id)\n"
    "  WHERE d.n_chars BETWEEN 150 AND 400\n)",
)
assert "n_chars" in _RANGE_SQL  # replace anchor must exist

# ES kNN search (exact cosine over a dense_vector mapped field): docs
# carry the embeddings-table vector joined on doc_id = vec_id (docs
# beyond the embeddings table have no vector and are never hits); query
# vectors = embeddings 0..2; DOUBLE[] casts per the oracle contract
_KNN_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id IN (0, 1, 2)
),
v AS (
  SELECT d.doc_id, CAST(e.embedding AS DOUBLE[]) AS ev
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
),
sims AS (
  SELECT q.query_id, v.doc_id,
         round(list_cosine_similarity(q.qv, v.ev), 6) AS score
  FROM q CROSS JOIN v
),
topk AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rank
  FROM sims
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM topk WHERE rank <= 10 ORDER BY 1, 2
"""


# ES hybrid search via RRF: BM25 retriever (derived queries 0-2) + kNN
# retriever (embeddings 0-2) each to depth 20, fused as
# round6(sum 1/(60 + rank)); final top-10 ties doc_id asc
_RRF_SQL = _BM25_SQL.split("SELECT query_id, rank::BIGINT")[0].replace(
    "topk AS (", "bm_topk AS ("
) + """,
knnq AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id IN (0, 1, 2)
),
knnv AS (
  SELECT d.doc_id, CAST(e.embedding AS DOUBLE[]) AS ev
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
),
knn_topk AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(list_cosine_similarity(qv, ev), 6) DESC, doc_id ASC
         ) AS rank
  FROM knnq CROSS JOIN knnv
),
fused AS (
  SELECT query_id, doc_id, round(sum(1.0 / (60 + rank)), 6) AS score
  FROM (
    SELECT query_id, doc_id, rank FROM bm_topk
    WHERE rank <= 20 AND query_id < 3
    UNION ALL
    SELECT query_id, doc_id, rank FROM knn_topk WHERE rank <= 20
  ) GROUP BY 1, 2
),
final AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rank
  FROM fused
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM final WHERE rank <= 10 ORDER BY 1, 2
"""
assert "bm_topk" in _RRF_SQL and _RRF_SQL.count("knn_topk") == 2


# ES `linear` retriever (minmax normalizer): same retriever pair as RRF
# to depth 20, fused as round6(2*minmax(bm25) + 1*minmax(cosine)); a
# degenerate window (max == min) normalizes to 1.0 (engine convention)
_LINEAR_SQL = _BM25_SQL.split("SELECT query_id, rank::BIGINT")[0].replace(
    "topk AS (", "bm_topk AS ("
) + """,
knnq AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id IN (0, 1, 2)
),
knnv AS (
  SELECT d.doc_id, CAST(e.embedding AS DOUBLE[]) AS ev
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
),
knn_topk AS (
  SELECT query_id, doc_id,
         round(list_cosine_similarity(qv, ev), 6) AS score,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(list_cosine_similarity(qv, ev), 6) DESC, doc_id ASC
         ) AS rank
  FROM knnq CROSS JOIN knnv
),
contribs AS (
  SELECT query_id, doc_id,
         2.0 * CASE WHEN mx = mn THEN 1.0 ELSE (score - mn) / (mx - mn) END AS c
  FROM (
    SELECT query_id, doc_id, score,
           min(score) OVER (PARTITION BY query_id) AS mn,
           max(score) OVER (PARTITION BY query_id) AS mx
    FROM bm_topk WHERE rank <= 20 AND query_id < 3
  )
  UNION ALL
  SELECT query_id, doc_id,
         1.0 * CASE WHEN mx = mn THEN 1.0 ELSE (score - mn) / (mx - mn) END AS c
  FROM (
    SELECT query_id, doc_id, score,
           min(score) OVER (PARTITION BY query_id) AS mn,
           max(score) OVER (PARTITION BY query_id) AS mx
    FROM knn_topk WHERE rank <= 20
  )
),
fused AS (
  SELECT query_id, doc_id, round(sum(c), 6) AS score
  FROM contribs GROUP BY 1, 2
),
final AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rank
  FROM fused
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM final WHERE rank <= 10 ORDER BY 1, 2
"""
assert "contribs" in _LINEAR_SQL and _LINEAR_SQL.count("minmax") == 0


# ES ids query: docs by external _id (documents keys are str(doc_id)),
# constant score 1.0, ties doc_id asc; an absent id is simply not a hit
_IDS_SQL = """
SELECT 0::BIGINT AS query_id,
       row_number() OVER (ORDER BY doc_id ASC)::BIGINT AS rank,
       doc_id, 1.0 AS score
FROM documents WHERE doc_id IN (10, 20, 30, 40)
ORDER BY 2
"""


# ES constant_score over a prefix filter: docs matching any term with
# the top-4 ranked terms' 3-char prefixes, score = boost 2.0, top-10 =
# the 10 smallest matching doc_ids per query (all scores tie)
_PREFIX_SCORE_SQL = """
WITH toks AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
tf AS (SELECT DISTINCT doc_id, term FROM toks),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
ranked_terms AS (
  SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df
),
prefixes AS (
  SELECT (r - 1)::BIGINT AS query_id, substr(term, 1, 3) AS p
  FROM ranked_terms WHERE r <= 4
),
matches AS (
  SELECT DISTINCT p.query_id, tf.doc_id
  FROM prefixes p JOIN tf ON starts_with(tf.term, p.p)
),
topk AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY doc_id ASC) AS rank
  FROM matches
)
SELECT query_id, rank::BIGINT AS rank, doc_id, 2.0 AS score
FROM topk WHERE rank <= 10 ORDER BY 1, 2
""".replace("{_TOK}", _TOK)


# ES bool filter term clause ({"term": {source: v}}): same scores, docs
# whose source keyword value != the corpus's modal source are dropped
# BEFORE ranking (filter context: no score contribution); v = most
# frequent source value, ties broken lexicographically
_WEIGHTED_TERMS_SQL = """
WITH tl AS (SELECT doc_id, {_TOK} AS t FROM documents),
toks AS (SELECT doc_id, unnest(t) AS term FROM tl),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
ranked AS (
  SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df
),
q AS (
  SELECT term, 1.5 AS wt FROM ranked WHERE r = 1
  UNION ALL SELECT term, 0.4 FROM ranked WHERE r = 2
  UNION ALL SELECT term, 2.0 FROM ranked WHERE r = 3
),
scored AS (
  SELECT tf.doc_id, round(sum(q.wt * tf.tf), 6) AS score
  FROM q JOIN tf USING (term) GROUP BY 1
)
SELECT 0::BIGINT AS query_id,
       row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
""".replace("{_TOK}", _TOK)

# match fuzziness=1: probe = top ranked term minus last char; the query
# term set = vocabulary terms with levenshtein <= 1 of the probe, scored
# as the plain bool-OR BM25 sum (each expanded term with its own df/idf)
_MATCH_FUZZY_SQL = _BM25_SQL.replace(
    """queries AS (
  SELECT 0 AS query_id, term FROM ranked_terms WHERE r = 1
  UNION ALL SELECT 1, term FROM ranked_terms WHERE r IN (2, 3)
  UNION ALL SELECT 2, term FROM ranked_terms WHERE r IN (4, 5, 6)
  UNION ALL SELECT 3, term FROM ranked_terms WHERE r IN (7, 8)
),""",
    """probe AS (
  SELECT substr(term, 1, len(term) - 1) AS p FROM ranked_terms WHERE r = 1
),
queries AS (
  SELECT 0 AS query_id, df.term FROM df, probe
  WHERE levenshtein(df.term, probe.p) <= 1
),""",
)

_TERMS_LOOKUP_SQL = _BM25_SQL.replace(
    "  FROM scores\n)",
    "  FROM scores JOIN documents d USING (doc_id)\n"
    "  WHERE d.lang = (SELECT lang FROM documents WHERE doc_id = 0)\n)",
)

_KW_FILTER_SQL = _BM25_SQL.replace(
    "  FROM scores\n)",
    "  FROM scores JOIN documents d USING (doc_id)\n"
    "  WHERE d.source = (SELECT source FROM documents GROUP BY 1\n"
    "                    ORDER BY count(*) DESC, source LIMIT 1)\n)",
)
assert "d.source" in _KW_FILTER_SQL

# ES min_score: each query's floor = its own 5th-ranked score (taken
# from a first pass); hits below the floor are dropped, surviving ranks
# are unchanged (filtering only removes, ties at the floor survive)
_MIN_SCORE_SQL = _BM25_SQL.replace(
    "SELECT query_id, rank::BIGINT AS rank, doc_id, score\nFROM topk WHERE rank <= 10",
    """floors AS (
  SELECT query_id, score AS floor FROM topk WHERE rank = 5
)
SELECT t.query_id, t.rank::BIGINT AS rank, t.doc_id, t.score
FROM topk t JOIN floors f USING (query_id)
WHERE t.score >= f.floor AND t.rank <= 10
ORDER BY 1, 2""",
).replace(
    "  FROM scores\n)\nfloors AS (", "  FROM scores\n),\nfloors AS ("
)
assert "floors" in _MIN_SCORE_SQL and _MIN_SCORE_SQL.count("),\nfloors") == 1

# ES fields / docvalue_fields retrieval: the BM25 top-k with the
# source (keyword) and n_chars (numeric) docstore columns per hit
_FETCH_FIELDS_SQL = _BM25_SQL.replace(
    "SELECT query_id, rank::BIGINT AS rank, doc_id, score\nFROM topk WHERE rank <= 10",
    "SELECT t.query_id, t.rank::BIGINT AS rank, t.doc_id, t.score,\n"
    "       d.source, d.n_chars::DOUBLE AS n_chars\n"
    "FROM topk t JOIN documents d USING (doc_id) WHERE t.rank <= 10",
)
assert "d.n_chars" in _FETCH_FIELDS_SQL

# ES rescore (phrase rescorer, window covering every hit): base = OR
# match on the corpus's top bigram's words; combined = round6(qw*base +
# rw*phrase_bm25) where the phrase score is the bigram-adjacency BM25
# (0 for docs without the exact bigram)
_RESCORE_SQL = """
WITH toks AS (
  SELECT doc_id, {_TOK} AS t FROM documents
),
dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM toks),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
big AS (
  SELECT unnest([{'w1': t[i], 'w2': t[i+1]} for i in generate_series(1, len(t)-1)]) AS bg
  FROM toks WHERE len(t) >= 2
),
top_bigram AS (
  SELECT bg.w1 AS w1, bg.w2 AS w2 FROM big
  GROUP BY 1, 2 ORDER BY count(*) DESC, w1 ASC, w2 ASC LIMIT 1
),
utoks AS (SELECT doc_id, unnest(t) AS term FROM toks),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM utoks GROUP BY 1, 2),
dfs AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM utoks GROUP BY 1),
qterms AS (
  SELECT w1 AS term FROM top_bigram UNION SELECT w2 FROM top_bigram
),
base AS (
  SELECT tf.doc_id, round(sum(
    ln(1 + (s.n - dfs.df + 0.5) / (dfs.df + 0.5))
    * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
  ), 6) AS bscore
  FROM qterms q
  JOIN tf ON tf.term = q.term
  JOIN dfs ON dfs.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1
),
pidf AS (
  SELECT ln(1 + (s.n - d1.df + 0.5) / (d1.df + 0.5))
       + ln(1 + (s.n - d2.df + 0.5) / (d2.df + 0.5)) AS v
  FROM top_bigram tb
  JOIN dfs d1 ON d1.term = tb.w1
  JOIN dfs d2 ON d2.term = tb.w2
  CROSS JOIN stats s
),
ptf AS (
  SELECT toks.doc_id,
         len([i for i in generate_series(1, len(t)-1)
              if t[i] = tb.w1 AND t[i+1] = tb.w2])::DOUBLE AS tf
  FROM toks, top_bigram tb
),
pscore AS (
  SELECT p.doc_id,
         round(pidf.v * p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)), 6) AS score
  FROM ptf p
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN pidf CROSS JOIN stats s
  WHERE p.tf > 0
),
comb AS (
  SELECT b.doc_id,
         round(1.0 * b.bscore + 2.0 * coalesce(p.score, 0), 6) AS score
  FROM base b LEFT JOIN pscore p USING (doc_id)
),
topk AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM comb
)
SELECT 0::BIGINT AS query_id, rank::BIGINT AS rank, doc_id, score
FROM topk WHERE rank <= 10 ORDER BY 2
""".replace("{_TOK}", _TOK)

# ES field collapsing: best doc per (query, lang), groups ranked by
# their best doc's (score desc, doc_id asc)
_COLLAPSE_SQL = _BM25_SQL.split("topk AS (")[0] + """grouped AS (
  SELECT s.query_id, d.lang, s.doc_id, round(s.raw_score, 6) AS score,
         row_number() OVER (
           PARTITION BY s.query_id, d.lang
           ORDER BY round(s.raw_score, 6) DESC, s.doc_id ASC
         ) AS rn
  FROM scores s JOIN documents d USING (doc_id)
),
topk AS (
  SELECT query_id, doc_id, score, lang AS collapse_val,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rank
  FROM grouped WHERE rn = 1
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score, collapse_val
FROM topk WHERE rank <= 10
"""

# ES function_score field_value_factor (modifier=ln1p, factor=1,
# boost_mode=multiply): boosted = round(round6(bm25) * ln(1 + n_chars), 6)
_FVF_SQL = _BM25_SQL.split("topk AS (")[0] + """topk AS (
  SELECT s.query_id, s.doc_id,
         round(round(s.raw_score, 6) * ln(1 + d.n_chars), 6) AS score,
         row_number() OVER (
           PARTITION BY s.query_id
           ORDER BY round(round(s.raw_score, 6) * ln(1 + d.n_chars), 6) DESC,
                    s.doc_id ASC
         ) AS rank
  FROM scores s JOIN documents d USING (doc_id)
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM topk WHERE rank <= 10
"""

# ES function_score gauss decay (origin=200, scale=150, offset=25,
# decay=0.5, boost_mode=multiply): boosted = round(round6(bm25) *
# exp(ln(0.5) * dist^2 / scale^2), 6), dist = max(0, |n_chars-200|-25)
_DECAY_SQL = _BM25_SQL.split("topk AS (")[0] + """topk AS (
  SELECT s.query_id, s.doc_id,
         round(round(s.raw_score, 6)
               * exp(ln(0.5) * pow(greatest(abs(d.n_chars - 200.0) - 25.0, 0.0), 2)
                     / (150.0 * 150.0)), 6) AS score,
         row_number() OVER (
           PARTITION BY s.query_id
           ORDER BY round(round(s.raw_score, 6)
               * exp(ln(0.5) * pow(greatest(abs(d.n_chars - 200.0) - 25.0, 0.0), 2)
                     / (150.0 * 150.0)), 6) DESC,
                    s.doc_id ASC
         ) AS rank
  FROM scores s JOIN documents d USING (doc_id)
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM topk WHERE rank <= 10
"""

# ES rank_feature (saturation, pivot=250, boost=1.5): additive feature
# boost over the round6'd BM25 base
_RANK_FEATURE_SQL = _BM25_SQL.split("topk AS (")[0] + """topk AS (
  SELECT s.query_id, s.doc_id,
         round(round(s.raw_score, 6)
               + 1.5 * (d.n_chars / (d.n_chars + 250.0)), 6) AS score,
         row_number() OVER (
           PARTITION BY s.query_id
           ORDER BY round(round(s.raw_score, 6)
                          + 1.5 * (d.n_chars / (d.n_chars + 250.0)), 6) DESC,
                    s.doc_id ASC
         ) AS rank
  FROM scores s JOIN documents d USING (doc_id)
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM topk WHERE rank <= 10
"""

# ES script_score: _score * ln1p(n_chars) + sqrt(n_chars) over the
# round6'd BM25 base
_SCRIPT_SCORE_SQL = _BM25_SQL.split("topk AS (")[0] + """topk AS (
  SELECT s.query_id, s.doc_id,
         round(round(s.raw_score, 6) * ln(1 + d.n_chars)
               + sqrt(d.n_chars), 6) AS score,
         row_number() OVER (
           PARTITION BY s.query_id
           ORDER BY round(round(s.raw_score, 6) * ln(1 + d.n_chars)
                          + sqrt(d.n_chars), 6) DESC,
                    s.doc_id ASC
         ) AS rank
  FROM scores s JOIN documents d USING (doc_id)
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM topk WHERE rank <= 10
"""

# ES more_like_this: per source doc (3 smallest doc_ids), query terms =
# top-10 by round6(tf * bm25_idf) (tf>=1, df>=2; ties term asc), then
# the standard or-match BM25 ranking with the source doc excluded
_SAMPLER_TOPK = _BM25_SQL.split("topk AS (")[0] + """topk AS (
  SELECT s.query_id, s.doc_id,
         row_number() OVER (
           PARTITION BY s.query_id
           ORDER BY round(s.raw_score, 6) DESC, s.doc_id ASC
         ) AS rank
  FROM scores s
)
"""

_SAMPLER_SQL = _SAMPLER_TOPK + """
SELECT t.query_id, d.lang AS value, count(*)::BIGINT AS n_docs
FROM topk t JOIN documents d USING (doc_id)
WHERE t.rank <= 25
GROUP BY 1, 2 ORDER BY 1, 3 DESC, 2
"""

_DIVERSIFIED_SAMPLER_SQL = _SAMPLER_TOPK + """
, samp AS (
  SELECT t.query_id, t.rank, d.lang, d.source,
         row_number() OVER (
           PARTITION BY t.query_id, d.source ORDER BY t.rank
         ) AS rs
  FROM topk t JOIN documents d USING (doc_id)
  WHERE t.rank <= 25
)
SELECT query_id, lang AS value, count(*)::BIGINT AS n_docs
FROM samp WHERE rs <= 3
GROUP BY 1, 2 ORDER BY 1, 3 DESC, 2
"""

_DISTANCE_FEATURE_SQL = _BM25_SQL.split("topk AS (")[0] + """topk AS (
  SELECT s.query_id, s.doc_id,
         round(round(s.raw_score, 6)
               + 2.0 * (604800.0 / (604800.0
                   + abs((1577836800 + (s.doc_id % 400) * 43200)
                         - 1586476800.0))), 6) AS score,
         row_number() OVER (
           PARTITION BY s.query_id
           ORDER BY round(round(s.raw_score, 6)
                          + 2.0 * (604800.0 / (604800.0
                              + abs((1577836800 + (s.doc_id % 400) * 43200)
                                    - 1586476800.0))), 6) DESC,
                    s.doc_id ASC
         ) AS rank
  FROM scores s
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM topk WHERE rank <= 10
"""

# span_containing / span_within: the big spans replayed in SQL are the
# minimal ones per start (min(p2) per w1 anchor) — exactly the engine's
# greedy nearest-next chain, which is also what Lucene's span_near
# enumerates.  Positions are 1-based here, 0-based in the engine; only
# relative gaps matter.
_SPAN_CONTAIN_SQL = """
WITH tl AS (SELECT doc_id, {_TOK} AS t FROM documents),
dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM tl),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
exdocs AS (SELECT DISTINCT doc_id, unnest(t) AS term FROM tl),
dfs AS (SELECT term, count(*)::DOUBLE AS df FROM exdocs GROUP BY 1),
ranked AS (SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM dfs),
w AS (SELECT (SELECT term FROM ranked WHERE r = 1) AS w1,
             (SELECT term FROM ranked WHERE r = 2) AS w2,
             (SELECT term FROM ranked WHERE r = 3) AS w3),
idf AS (
  SELECT ln(1 + (s.n - d1.df + 0.5) / (d1.df + 0.5))
       + ln(1 + (s.n - d2.df + 0.5) / (d2.df + 0.5))
       + ln(1 + (s.n - d3.df + 0.5) / (d3.df + 0.5)) AS v
  FROM w JOIN dfs d1 ON d1.term = w.w1 JOIN dfs d2 ON d2.term = w.w2
         JOIN dfs d3 ON d3.term = w.w3
  CROSS JOIN stats s
),
pos AS (SELECT doc_id, unnest(t) AS term, generate_subscripts(t, 1) AS p FROM tl),
p1 AS (SELECT pos.doc_id, pos.p FROM pos, w WHERE pos.term = w.w1),
p2 AS (SELECT pos.doc_id, pos.p FROM pos, w WHERE pos.term = w.w2),
p3 AS (SELECT pos.doc_id, pos.p FROM pos, w WHERE pos.term = w.w3),
spans AS (
  SELECT p1.doc_id, p1.p AS fp, min(p2.p) AS lp
  FROM p1 JOIN p2 ON p2.doc_id = p1.doc_id AND p2.p > p1.p
  GROUP BY 1, 2
  HAVING min(p2.p) - p1.p - 1 <= 3
),
ptf AS ({tfcte}),
scored AS (
  SELECT p.doc_id,
         round(idf.v * p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)), 6) AS score
  FROM ptf p JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN idf CROSS JOIN stats s
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank, doc_id, score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
""".replace("{_TOK}", _TOK)

_SPAN_CONTAINING_SQL = _SPAN_CONTAIN_SQL.replace(
    "{tfcte}",
    """
  SELECT s2.doc_id, count(*)::DOUBLE AS tf FROM (
    SELECT DISTINCT s.doc_id, s.fp FROM spans s
    JOIN p3 ON p3.doc_id = s.doc_id AND p3.p BETWEEN s.fp AND s.lp
  ) s2 GROUP BY 1
""",
)

_SPAN_WITHIN_SQL = _SPAN_CONTAIN_SQL.replace(
    "{tfcte}",
    """
  SELECT s2.doc_id, count(*)::DOUBLE AS tf FROM (
    SELECT DISTINCT p3.doc_id, p3.p FROM p3
    JOIN spans s ON s.doc_id = p3.doc_id AND p3.p BETWEEN s.fp AND s.lp
  ) s2 GROUP BY 1
""",
)

_MLT_SQL = """
WITH dl AS (
  SELECT doc_id, len({_TOK})::DOUBLE AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
),
toks AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
df AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1
),
srcs AS (
  SELECT doc_id AS src_id,
         (row_number() OVER (ORDER BY doc_id) - 1)::BIGINT AS query_id
  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 3)
),
cand AS (
  SELECT s.query_id, s.src_id, tf.term,
         round(tf.tf * ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5)), 6) AS w
  FROM srcs s
  JOIN tf ON tf.doc_id = s.src_id
  JOIN df USING (term)
  CROSS JOIN stats st
  WHERE df.df >= 2
),
qterms AS (
  SELECT query_id, src_id, term FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY w DESC, term ASC) AS rn
    FROM cand
  ) WHERE rn <= 10
),
scores AS (
  SELECT q.query_id, q.src_id, tf.doc_id,
         sum(
           ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))
         ) AS raw_score
  FROM qterms q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats st
  GROUP BY 1, 2, 3
),
topk AS (
  SELECT query_id, doc_id, round(raw_score, 6) AS score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(raw_score, 6) DESC, doc_id ASC
         ) AS rank
  FROM scores WHERE doc_id <> src_id
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM topk WHERE rank <= 10
""".replace("{_TOK}", _TOK)

# ES more_like_this with `unlike`: the 4th doc's terms form an
# exclusion vocabulary removed from every source's candidate set
_MLT_UNLIKE_SQL = _MLT_SQL.replace(
    "  WHERE df.df >= 2\n),",
    """  WHERE df.df >= 2
    AND tf.term NOT IN (
      SELECT DISTINCT t2.term FROM toks t2
      WHERE t2.doc_id = (
        SELECT doc_id FROM documents ORDER BY doc_id LIMIT 1 OFFSET 3
      )
    )
),""",
)
assert "OFFSET 3" in _MLT_UNLIKE_SQL

# ES terms-agg + top_hits: every lang bucket's top-3 docs by BM25
_TOP_HITS_SQL = _BM25_SQL.split("topk AS (")[0] + """topk AS (
  SELECT s.query_id, d.lang AS value, s.doc_id, round(s.raw_score, 6) AS score,
         row_number() OVER (
           PARTITION BY s.query_id, d.lang
           ORDER BY round(s.raw_score, 6) DESC, s.doc_id ASC
         ) AS rank
  FROM scores s JOIN documents d USING (doc_id)
)
SELECT query_id, value, rank::BIGINT AS rank, doc_id, score
FROM topk WHERE rank <= 3
"""

# ES _rank_eval: BM25 top-10 judged against and-match relevance;
# idcg joined from a precomputed table keyed by min(10, n_relevant)
_RANK_EVAL_SQL = _BM25_SQL.split("SELECT query_id, rank::BIGINT")[0] + """,
rel AS (
  SELECT q.query_id, tf.doc_id
  FROM queries q JOIN tf ON tf.term = q.term
  GROUP BY 1, 2
  HAVING count(DISTINCT tf.term) =
         (SELECT count(*) FROM queries q2 WHERE q2.query_id = q.query_id)
),
top10 AS (SELECT query_id, doc_id, rank FROM topk WHERE rank <= 10),
hits AS (
  SELECT t.query_id, t.rank FROM top10 t
  JOIN rel r ON r.query_id = t.query_id AND r.doc_id = t.doc_id
),
idcg_t AS (
  SELECT s.n, sum(1.0 / log2(t.i + 1)) AS idcg
  FROM generate_series(1, 10) AS s(n), generate_series(1, 10) AS t(i)
  WHERE t.i <= s.n GROUP BY s.n
),
agg AS (
  SELECT q.query_id,
         (SELECT count(*) FROM top10 t WHERE t.query_id = q.query_id) AS n_retrieved,
         (SELECT count(*) FROM rel r WHERE r.query_id = q.query_id) AS n_relevant,
         (SELECT count(*) FROM hits h WHERE h.query_id = q.query_id) AS n_hit,
         (SELECT min(rank) FROM hits h WHERE h.query_id = q.query_id) AS first_rank,
         (SELECT coalesce(sum(1.0 / log2(h.rank + 1)), 0)
          FROM hits h WHERE h.query_id = q.query_id) AS dcg
  FROM (SELECT DISTINCT query_id FROM queries) q
)
SELECT a.query_id, a.n_retrieved::BIGINT AS n_retrieved,
       a.n_relevant::BIGINT AS n_relevant,
       round(CASE WHEN a.n_retrieved > 0
             THEN a.n_hit / (a.n_retrieved * 1.0) ELSE 0 END, 6) AS precision,
       round(CASE WHEN a.n_relevant > 0
             THEN a.n_hit / (a.n_relevant * 1.0) ELSE 0 END, 6) AS recall,
       round(CASE WHEN a.first_rank IS NOT NULL
             THEN 1.0 / a.first_rank ELSE 0 END, 6) AS mrr,
       round(CASE WHEN a.n_hit > 0 AND a.n_relevant > 0
             THEN a.dcg / i.idcg ELSE 0 END, 6) AS ndcg
FROM agg a
LEFT JOIN idcg_t i ON i.n = least(10, a.n_relevant)
ORDER BY 1
"""

# shared match-set CTE prefix for the numeric aggregations (same query
# derivation as _BM25_SQL; operator=or match set, no top-k cap)
_MATCHES_CTE = """
WITH toks AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
tf AS (SELECT DISTINCT doc_id, term FROM toks),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
ranked_terms AS (
  SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df
),
queries AS (
  SELECT 0 AS query_id, term FROM ranked_terms WHERE r = 1
  UNION ALL SELECT 1, term FROM ranked_terms WHERE r IN (2, 3)
  UNION ALL SELECT 2, term FROM ranked_terms WHERE r IN (4, 5, 6)
  UNION ALL SELECT 3, term FROM ranked_terms WHERE r IN (7, 8)
),
matches AS (
  SELECT DISTINCT q.query_id, tf.doc_id FROM queries q JOIN tf ON tf.term = q.term
)
""".replace("{_TOK}", _TOK)

# ES terms agg include/exclude: anchored regex value filters applied
# before bucket ordering (regexp_full_match == the engine's fullmatch)
_TERMS_INCLUDE_SQL = _MATCHES_CTE + """
SELECT m.query_id, d.source AS value, count(*)::BIGINT AS n_docs
FROM matches m JOIN documents d USING (doc_id)
WHERE regexp_full_match(d.source, 'src[0-4]')
  AND NOT regexp_full_match(d.source, 'src3')
GROUP BY 1, 2 ORDER BY 1, 2
"""

# ES histogram offset=37 + min_doc_count=0: shifted bucket keys with
# driver-side gap filling between each query's min and max keys
_HISTOGRAM_OFFSET_SQL = _MATCHES_CTE + """
, buckets AS (
  SELECT m.query_id,
         (floor((d.n_chars - 37.0) / 100.0) * 100.0 + 37.0)::DOUBLE AS bucket,
         count(*)::BIGINT AS n
  FROM matches m JOIN documents d USING (doc_id)
  WHERE d.n_chars IS NOT NULL
  GROUP BY 1, 2
),
bounds AS (
  SELECT query_id, min(bucket) AS lo, max(bucket) AS hi FROM buckets GROUP BY 1
),
grid AS (
  SELECT query_id,
         unnest(generate_series(CAST(lo AS BIGINT), CAST(hi AS BIGINT), 100))::DOUBLE
           AS bucket
  FROM bounds
)
SELECT g.query_id, g.bucket, coalesce(b.n, 0)::BIGINT AS n_docs
FROM grid g LEFT JOIN buckets b USING (query_id, bucket)
ORDER BY 1, 2
"""

# ES random_sampler aggregation: lang terms sub-agg over the p=0.3
# deterministic doc sample of each match set (the sampling md5 contract,
# seed 42), counts scaled by 1/p
_RANDOM_SAMPLER_SQL = _MATCHES_CTE + """
, sampled AS (
  SELECT m.query_id, d.lang AS value
  FROM matches m JOIN documents d USING (doc_id)
  WHERE md5_number_lower('42:' || m.doc_id) % 1000000 < 300000
),
counts AS (
  SELECT query_id, value, count(*)::BIGINT AS n_sampled
  FROM sampled GROUP BY 1, 2
)
SELECT query_id, value, n_sampled, round(n_sampled / 0.3, 6) AS n_scaled
FROM counts ORDER BY query_id, n_sampled DESC, value ASC
"""

# ES filters aggregation: named lang term-filter buckets + _other_;
# zero-count named buckets emitted (ES returns every named bucket)
_FILTERS_AGG_SQL = _MATCHES_CTE + """
, counts AS (
  SELECT m.query_id, d.lang, count(*)::BIGINT AS n
  FROM matches m JOIN documents d USING (doc_id) GROUP BY 1, 2
),
qids AS (SELECT DISTINCT query_id FROM queries),
named(bucket, v) AS (VALUES ('absent', 'xx'), ('english', 'en'), ('german', 'de'))
SELECT q.query_id, nm.bucket,
       coalesce((SELECT n FROM counts c
                 WHERE c.query_id = q.query_id AND c.lang = nm.v), 0)::BIGINT AS n_docs
FROM qids q CROSS JOIN named nm
UNION ALL
SELECT q.query_id, '_other_',
       (coalesce((SELECT sum(n) FROM counts c WHERE c.query_id = q.query_id), 0)
        - coalesce((SELECT sum(n) FROM counts c JOIN named nm ON c.lang = nm.v
                    WHERE c.query_id = q.query_id), 0))::BIGINT
FROM qids q
ORDER BY 1, 2
"""

# ES adjacency_matrix: named filters + pairwise intersections, zero
# buckets omitted (names sorted; same-field disjoint pairs drop to 0)
_ADJ_MATRIX_SQL = _MATCHES_CTE + """
, vals AS (
  SELECT m.query_id, d.lang, d.source
  FROM matches m JOIN documents d USING (doc_id)
)
SELECT query_id, bucket, n_docs FROM (
  SELECT query_id, 'eng' AS bucket, count(*)::BIGINT AS n_docs FROM vals WHERE lang = 'en' GROUP BY 1
  UNION ALL SELECT query_id, 'eng&ger', count(*)::BIGINT FROM vals WHERE lang = 'en' AND lang = 'de' GROUP BY 1
  UNION ALL SELECT query_id, 'eng&s1', count(*)::BIGINT FROM vals WHERE lang = 'en' AND source = 'src1' GROUP BY 1
  UNION ALL SELECT query_id, 'ger' AS bucket, count(*)::BIGINT FROM vals WHERE lang = 'de' GROUP BY 1
  UNION ALL SELECT query_id, 'ger&s1', count(*)::BIGINT FROM vals WHERE lang = 'de' AND source = 'src1' GROUP BY 1
  UNION ALL SELECT query_id, 's1', count(*)::BIGINT FROM vals WHERE source = 'src1' GROUP BY 1
) WHERE n_docs > 0 ORDER BY 1, 2
"""

# Shared numeric-value projection for the aggregation-family oracles:
# x = n_chars, y = analyzer token count, ts = the deterministic derived
# epoch-seconds stamp (mirrors _agg_index_build's add_derived)
_AGG_VALS_CTE = _MATCHES_CTE + """
, vals AS (
  SELECT m.query_id, d.doc_id, d.n_chars::DOUBLE AS x,
         (1577836800 + (d.doc_id % 400) * 43200)::BIGINT AS ts,
         len({_TOK})::DOUBLE AS y, d.lang, d.source
  FROM matches m JOIN documents d USING (doc_id)
)
""".replace("{_TOK}", _TOK)

# ES extended_stats: population variance via the SAME exact-sum formula
# as the engine — (n*ss - s^2)/n^2 over exact integer sums — so doubles
# match bit-for-bit before the 6dp round
_EXT_STATS_SQL = _AGG_VALS_CTE + """
SELECT query_id, count(*)::BIGINT AS n_docs, min(x) AS min_val,
       max(x) AS max_val, sum(x) AS sum_val,
       round(sum(x)/count(*), 6) AS avg_val, sum(x*x) AS sum_sq,
       round((count(*)*sum(x*x) - sum(x)*sum(x)) / (count(*)*count(*)), 6) AS variance,
       round(sqrt((count(*)*sum(x*x) - sum(x)*sum(x)) / (count(*)*count(*))), 6) AS std_dev
FROM vals GROUP BY 1 ORDER BY 1
"""

_DATE_HIST_SQL = _AGG_VALS_CTE + """
SELECT query_id,
       epoch(date_trunc('month', to_timestamp(ts)))::BIGINT AS bucket_ts,
       count(*)::BIGINT AS n_docs
FROM vals GROUP BY 1, 2 ORDER BY 1, 2
"""

# ES date_histogram fixed_interval=7d: epoch-anchored fixed buckets
# Derived deterministic URLs (mirrors _url_docs: exact integer/string
# construction on both engines) + the frozen canon_v1 regex replay —
# RE2 on both sides (pandas passes RE2-compatible patterns to Python re;
# DuckDB regexp_replace backslash refs in single-quoted literals)
_URL_CTE = r"""
WITH u AS (
  SELECT doc_id,
         'https://ExAmple' || (doc_id % 5)::VARCHAR || '.COM'
         || CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END
         || '/Page/' || (doc_id % 100)::VARCHAR
         || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
         || CASE WHEN doc_id % 2 = 0
                 THEN '?utm_source=feed&ref=' || (doc_id % 3)::VARCHAR
                 WHEN doc_id % 7 = 0 THEN '?gclid=x' ELSE '' END
         || CASE WHEN doc_id % 6 = 0
                 THEN '#s' || (doc_id % 3)::VARCHAR ELSE '' END AS url
  FROM documents
),
canon0 AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^[^/?#]+//[^/?#]+'))
           || regexp_replace(url, '^[^/?#]+//[^/?#]+', '') AS c0
  FROM u
),
canon AS (
  SELECT doc_id, url,
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(c0, '#.*$', ''),
                '^(https://[^/:?#]+):443([/?]|$)', '\1\2'),
              '^(http://[^/:?#]+):80([/?]|$)', '\1\2'),
            '&(utm_[a-z0-9_]*|fbclid|gclid)=[^&]*', '', 'g'),
          '\?(utm_[a-z0-9_]*|fbclid|gclid)=[^&]*&', '?'),
        '\?(utm_[a-z0-9_]*|fbclid|gclid)=[^&]*$', ''),
      '/$', '') AS canon_url
  FROM canon0
)
"""

_CANON_URLS_SQL = _URL_CTE + """
SELECT doc_id, canon_url FROM canon ORDER BY doc_id
"""

_URL_DEDUP_SQL = _URL_CTE + """
SELECT min(doc_id)::BIGINT AS doc_id, count(*)::BIGINT AS n_copies
FROM canon GROUP BY canon_url ORDER BY 1
"""

# Host-level quality curation: failing hosts = sum(n_chars) < T*count
# (exact integer comparison on both engines), their docs dropped
_HOST_QUALITY_SQL = _URL_CTE + """
, hs AS (
  SELECT lower(regexp_extract(u.url, '^[^/?#]+//([^/?#:]+)', 1)) AS host,
         u.doc_id, d.n_chars
  FROM u JOIN documents d USING (doc_id)
),
bad AS (
  SELECT host FROM hs GROUP BY 1 HAVING sum(n_chars) < 300 * count(*)
)
SELECT doc_id, host FROM hs WHERE host NOT IN (SELECT host FROM bad)
ORDER BY doc_id
"""

# URL spam signals: the engine's exact integer arithmetic replayed —
# depth counts, milli digit-fraction (integer // — no float ratio),
# query length, rule-count score
_URL_QUALITY_SQL = _URL_CTE + """
, f AS (
  SELECT doc_id,
         lower(regexp_extract(url, '^[^/?#]+//([^/?#:]+)', 1)) AS host,
         regexp_replace(url, '^[^/?#]+//[^/?#]+', '') AS rest
  FROM u
),
g AS (
  SELECT doc_id,
         (len(host) - len(replace(host, '.', '')))::BIGINT AS host_depth,
         (length(regexp_replace(rest, '[?#].*$', ''))
          - length(replace(regexp_replace(rest, '[?#].*$', ''), '/', '')))::BIGINT
           AS path_depth,
         CASE WHEN len(host) > 0
              THEN ((len(host) - len(regexp_replace(host, '[0-9]', '', 'g')))
                    * 1000) // len(host)
              ELSE 0 END::BIGINT AS host_digit_milli,
         len(coalesce(regexp_extract(rest, '\?([^#]*)', 1), ''))::BIGINT
           AS query_len
  FROM f
)
SELECT doc_id, host_depth, path_depth, host_digit_milli, query_len,
       ((host_depth > 3)::BIGINT + (host_digit_milli > 200)::BIGINT
        + (query_len > 50)::BIGINT + (path_depth > 6)::BIGINT) AS url_spam
FROM g ORDER BY doc_id
"""

_DOMAIN_COUNTS_SQL = _URL_CTE + """
SELECT host, count(*)::BIGINT AS n_docs FROM (
  SELECT lower(regexp_extract(url, '^[^/?#]+//([^/?#:]+)', 1)) AS host FROM u
)
WHERE host NOT IN ('example1.com', 'example3.com')
GROUP BY 1 ORDER BY 1
"""

# ES histogram over a runtime field: same integer-valued expression,
# interval-50 floor buckets
_RUNTIME_HIST_SQL = _AGG_VALS_CTE + """
SELECT query_id,
       (floor((x + 2 * y) / 50.0) * 50.0)::DOUBLE AS bucket,
       count(*)::BIGINT AS n_docs
FROM vals GROUP BY 1, 2 ORDER BY 1, 2
"""

# ES stats over a runtime field: integer-valued script expression so
# float sums are exact in any accumulation order on both engines
_RUNTIME_STATS_SQL = _AGG_VALS_CTE + """
SELECT query_id,
       count(*)::BIGINT AS n_docs,
       min(x + 2 * y)::DOUBLE AS min_val,
       max(x + 2 * y)::DOUBLE AS max_val,
       sum(x + 2 * y)::DOUBLE AS sum_val,
       round(sum(x + 2 * y)::DOUBLE / count(*), 6) AS avg_val
FROM vals GROUP BY 1 ORDER BY 1
"""

# ES runtime-field sort: rank by the script value n_chars*3 - n_tokens*7
# (exact integer-valued doubles on both engines), ties doc_id asc
_RUNTIME_SORT_SQL = _AGG_VALS_CTE + """
, rv AS (
  SELECT query_id, doc_id, x * 3 - y * 7 AS sort_val,
         row_number() OVER (
           PARTITION BY query_id ORDER BY (x * 3 - y * 7) DESC, doc_id ASC
         ) AS rank
  FROM vals
)
SELECT query_id, rank::BIGINT AS rank, doc_id, sort_val
FROM rv WHERE rank <= 10 ORDER BY 1, 2
"""

# ES bucket_correlation (Pearson core): monthly bucket doc counts vs the
# indicator (bucket_ts // 86400) % 7 — exact BIGINT moment sums, the
# identical double formula on both engines, sign-aware 6dp round;
# queries with <2 buckets or zero variance omitted (ES null)
_BUCKET_CORR_SQL = _AGG_VALS_CTE + """
, b AS (
  SELECT query_id,
         epoch(date_trunc('month', to_timestamp(ts)))::BIGINT AS bucket_ts,
         count(*)::BIGINT AS n
  FROM vals GROUP BY 1, 2
),
e AS (
  SELECT query_id, n, ((bucket_ts // 86400) % 7)::BIGINT AS x FROM b
)
SELECT query_id,
       round((count(*)*sum(x*n) - sum(x)*sum(n))
             / sqrt((count(*)*sum(x*x) - sum(x)*sum(x))
                    * (count(*)*sum(n*n) - sum(n)*sum(n))), 6) AS correlation
FROM e GROUP BY 1
HAVING count(*) >= 2
   AND (count(*)*sum(x*x) - sum(x)*sum(x))
       * (count(*)*sum(n*n) - sum(n)*sum(n)) > 0
ORDER BY 1
"""

# ES bucket_count_ks_test (two-sided vs uniform fractions): KS distance
# between the monthly bucket-count ECDF and i/n_buckets — each CDF point
# one integer/integer double division on both engines
_BUCKET_KS_SQL = _AGG_VALS_CTE + """
, b AS (
  SELECT query_id,
         epoch(date_trunc('month', to_timestamp(ts)))::BIGINT AS bucket_ts,
         count(*)::BIGINT AS n
  FROM vals GROUP BY 1, 2
),
c AS (
  SELECT query_id,
         sum(n) OVER (PARTITION BY query_id ORDER BY bucket_ts) AS cn,
         sum(n) OVER (PARTITION BY query_id) AS tot,
         row_number() OVER (PARTITION BY query_id ORDER BY bucket_ts) AS i,
         count(*) OVER (PARTITION BY query_id) AS nb
  FROM b
)
SELECT query_id,
       round(max(abs(cn::DOUBLE / tot::DOUBLE - i::DOUBLE / nb::DOUBLE)), 6)
         AS ks_stat
FROM c GROUP BY 1 ORDER BY 1
"""

# ES date_range aggregation over the derived epoch-seconds ts column:
# ISO bounds resolved to epoch seconds (UTC) with [from, to); either
# side open; overlapping ranges counted independently; empty kept at 0.
# 2020-02-15T12:00:00 = 1581768000, 2020-03-01 = 1583020800,
# 2020-05-01 = 1588291200 (UTC)
_DATE_RANGE_KEYED_SQL = _AGG_VALS_CTE + """
SELECT query_id, range_key, n_docs FROM (
  SELECT query_id, '*-2020-03-01' AS range_key,
         count(*) FILTER (WHERE ts < 1583020800)::BIGINT AS n_docs
  FROM vals GROUP BY 1
  UNION ALL
  SELECT query_id, '2020-03-01-2020-05-01',
         count(*) FILTER (WHERE ts >= 1583020800 AND ts < 1588291200)::BIGINT
  FROM vals GROUP BY 1
  UNION ALL
  SELECT query_id, '2020-02-15T12:00:00-2020-03-01',
         count(*) FILTER (WHERE ts >= 1581768000 AND ts < 1583020800)::BIGINT
  FROM vals GROUP BY 1
  UNION ALL
  SELECT query_id, '2020-05-01-*',
         count(*) FILTER (WHERE ts >= 1588291200)::BIGINT
  FROM vals GROUP BY 1
)
ORDER BY 1, 2
"""

_DATE_HIST_FIXED_SQL = _AGG_VALS_CTE + """
SELECT query_id,
       (ts // 604800 * 604800)::BIGINT AS bucket_ts,
       count(*)::BIGINT AS n_docs
FROM vals GROUP BY 1, 2 ORDER BY 1, 2
"""

# ES date_histogram min_doc_count=0 (the ES default): every calendar
# month between each query's first and last non-empty bucket, gaps as 0
_DATE_HIST_FILLED_SQL = _AGG_VALS_CTE + """
, b AS (
  SELECT query_id,
         epoch(date_trunc('month', to_timestamp(ts)))::BIGINT AS bucket_ts,
         count(*)::BIGINT AS n_docs
  FROM vals GROUP BY 1, 2
),
spans AS (
  SELECT query_id, to_timestamp(min(bucket_ts)) AS lo,
         to_timestamp(max(bucket_ts)) AS hi
  FROM b GROUP BY 1
),
grid AS (
  SELECT query_id,
         epoch(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)))::BIGINT
           AS bucket_ts
  FROM spans
)
SELECT g.query_id, g.bucket_ts, coalesce(b.n_docs, 0)::BIGINT AS n_docs
FROM grid g LEFT JOIN b USING (query_id, bucket_ts)
ORDER BY 1, 2
"""

_RANGE_AGG_SQL = _AGG_VALS_CTE + """
SELECT query_id,
       CASE WHEN x >= 450 THEN 450.0 WHEN x >= 300 THEN 300.0
            WHEN x >= 200 THEN 200.0 WHEN x >= 100 THEN 100.0
            ELSE 0.0 END AS range_from,
       count(*)::BIGINT AS n_docs
FROM vals WHERE x >= 0 GROUP BY 1, 2 ORDER BY 1, 2
"""

# Deterministic geo_point replay (mirrors fulltext.geo_documents_dataset:
# exact integer arithmetic, IEEE-identical on both engines) plus the
# per-doc round6 arc distance to the fixed origin (10, 20) — written
# term-for-term as the engine formula (functions/geo.py haversine_m) so
# libm last-ulp noise is the only divergence and round(,6) absorbs it.
# ES ip_range aggregation over the derived integer-ip column
# ip = (doc_id * 2654435761) % 2^32 (exact integer arithmetic on both
# engines): CIDR masks + from/to with [from, to); empty ranges kept at 0
_IP_RANGE_SQL = _MATCHES_CTE + """
, ips AS (
  SELECT m.query_id, (m.doc_id * 2654435761) % 4294967296 AS ip
  FROM matches m
)
SELECT query_id, range_key, n_docs FROM (
  SELECT query_id, '0.0.0.0/2' AS range_key,
         count(*) FILTER (WHERE ip < 1073741824)::BIGINT AS n_docs
  FROM ips GROUP BY 1
  UNION ALL
  SELECT query_id, '64.0.0.0/2',
         count(*) FILTER (WHERE ip >= 1073741824 AND ip < 2147483648)::BIGINT
  FROM ips GROUP BY 1
  UNION ALL
  SELECT query_id, '128.0.0.0-192.0.0.0',
         count(*) FILTER (WHERE ip >= 2147483648 AND ip < 3221225472)::BIGINT
  FROM ips GROUP BY 1
  UNION ALL
  SELECT query_id, '192.0.0.0-*',
         count(*) FILTER (WHERE ip >= 3221225472)::BIGINT
  FROM ips GROUP BY 1
)
ORDER BY 1, 2
"""

# ES geo_line aggregation: the track of each query's first 20 matching
# docs' derived geo points in doc_id order (the engine's sort key)
_GEO_LINE_SQL = _MATCHES_CTE + """
, pts AS (
  SELECT m.query_id, m.doc_id,
         ((m.doc_id * 37) % 18001) / 100.0 - 90.0 AS lat,
         ((m.doc_id * 53) % 36001) / 100.0 - 180.0 AS lon,
         row_number() OVER (PARTITION BY m.query_id ORDER BY m.doc_id) AS rn
  FROM matches m
)
SELECT query_id, (rn - 1)::BIGINT AS seq, doc_id,
       round(lat, 6) AS lat, round(lon, 6) AS lon
FROM pts WHERE rn <= 20 ORDER BY 1, 2
"""

_GEO_CTES = """geo AS (
  SELECT doc_id, ((doc_id * 37) % 18001) / 100.0 - 90.0 AS lat,
         ((doc_id * 53) % 36001) / 100.0 - 180.0 AS lon
  FROM documents
),
gd0 AS (
  SELECT doc_id, lat, lon,
         sin((radians(lat) - radians(10.0)) * 0.5) AS s1,
         sin((radians(lon) - radians(20.0)) * 0.5) AS s2,
         cos(radians(lat)) AS cla
  FROM geo
),
gdist AS (
  SELECT doc_id, lat, lon,
         round(2.0 * 6371008.7714 * asin(sqrt(least(
             s1 * s1 + cla * cos(radians(10.0)) * s2 * s2, 1.0))), 6) AS d
  FROM gd0
)
"""

# ES geo_distance filter clause: BM25 scores unchanged, docs beyond
# 7,000 km from (10, 20) dropped BEFORE ranking (filter context)
_GEO_DIST_FILTER_SQL = _BM25_SQL.replace(
    "WITH dl AS (", "WITH " + _GEO_CTES + ", dl AS ("
).replace(
    "  FROM scores\n)",
    "  FROM scores JOIN gdist USING (doc_id)\n  WHERE d <= 7000000.0\n)",
)
assert "gdist" in _GEO_DIST_FILTER_SQL  # replace anchors must exist

# ES geo_polygon filter clause: CONVEX triangle (0,-60) (60,0) (-30,70)
# — planar half-plane tests, SQL written in the ENGINE's exact arithmetic
# order ((lo2-lo1)*(lat-la1) - (la2-la1)*(lon-lo1), orientation sign -1
# for this vertex order) so boundary IEEE results match bit-for-bit
_GEO_POLY_FILTER_SQL = _BM25_SQL.replace(
    "WITH dl AS (", "WITH " + _GEO_CTES + ", dl AS ("
).replace(
    "  FROM scores\n)",
    "  FROM scores JOIN geo USING (doc_id)\n"
    "  WHERE ((0.0 - -60.0) * (lat - 0.0) - (60.0 - 0.0) * (lon - -60.0)) <= 0\n"
    "    AND ((70.0 - 0.0) * (lat - 60.0) - (-30.0 - 60.0) * (lon - 0.0)) <= 0\n"
    "    AND ((-60.0 - 70.0) * (lat - -30.0) - (0.0 - -30.0) * (lon - 70.0)) <= 0\n)",
)
assert "lat - -30.0" in _GEO_POLY_FILTER_SQL  # replace anchors must exist

# ES geo_bounding_box filter clause: inclusive box lat in [-30, 60],
# lon in [-90, 90] (no antimeridian crossing)
_GEO_BBOX_FILTER_SQL = _BM25_SQL.replace(
    "WITH dl AS (", "WITH " + _GEO_CTES + ", dl AS ("
).replace(
    "  FROM scores\n)",
    "  FROM scores JOIN geo g USING (doc_id)\n"
    "  WHERE g.lat BETWEEN -30.0 AND 60.0 AND g.lon BETWEEN -90.0 AND 90.0\n)",
)
assert "BETWEEN -30.0" in _GEO_BBOX_FILTER_SQL

# ES geo_distance aggregation: ring counts by round6 arc distance from
# (10, 20); edges (0, 2e6, 5e6, 1e7) m, key = the ring's lower edge
_GEO_RING_SQL = _MATCHES_CTE + ", " + _GEO_CTES + """
SELECT m.query_id,
       CASE WHEN d >= 10000000 THEN 10000000.0
            WHEN d >= 5000000 THEN 5000000.0
            WHEN d >= 2000000 THEN 2000000.0
            ELSE 0.0 END AS ring_from,
       count(*)::BIGINT AS n_docs
FROM matches m JOIN gdist USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""

# ES geotile_grid aggregation at zoom 3 (n = 8): web-mercator tile cell
# per doc — continuous coordinate round6-ed BEFORE floor exactly like
# functions/geo.py geotile_xy, lat clamped to the mercator domain; cut =
# top-10 by (count desc, packed x*8+y asc), the engine tie-break
_GEO_TILE_SQL = _MATCHES_CTE + ", " + _GEO_CTES + """,
cells AS (
  SELECT m.query_id,
         CAST(least(greatest(floor(round((lon + 180.0) / 360.0 * 8.0, 6)), 0), 7) AS BIGINT) AS x,
         CAST(least(greatest(floor(round(
             (1.0 - ln(tan(radians(cl)) + 1.0 / cos(radians(cl))) / pi())
             / 2.0 * 8.0, 6)), 0), 7) AS BIGINT) AS y
  FROM matches m
  JOIN (SELECT doc_id, lon,
               least(greatest(lat, -85.05112878), 85.05112878) AS cl
        FROM geo) g USING (doc_id)
),
cell_counts AS (
  SELECT query_id, x, y, count(*)::BIGINT AS n_docs,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY count(*) DESC, x * 8 + y ASC) AS rn
  FROM cells GROUP BY 1, 2, 3
)
SELECT query_id, '3/' || x || '/' || y AS tile, n_docs
FROM cell_counts WHERE rn <= 10 ORDER BY 1, 3 DESC, 2
"""

# ES geohash_grid aggregation at precision 2 (10 bits: 5 lon + 5 lat,
# first/most-significant bit lon): cell coords from the round6-ed
# continuous position (functions/geo.py geohash_cells), bits interleaved
# by explicit arithmetic, rendered base32; cut = top-10 by (count desc,
# cell asc) — the base32 alphabet is ascending so int order == string
# order
_GEOHASH_SQL = _MATCHES_CTE + ", " + _GEO_CTES + """,
gh0 AS (
  SELECT m.query_id,
         CAST(least(greatest(floor(round((lon + 180.0) / 360.0 * 32.0, 6)), 0), 31) AS BIGINT) AS xi,
         CAST(least(greatest(floor(round((lat +  90.0) / 180.0 * 32.0, 6)), 0), 31) AS BIGINT) AS yi
  FROM matches m JOIN geo USING (doc_id)
),
gh AS (
  SELECT query_id,
         ((xi >> 4) & 1) * 512 + ((yi >> 4) & 1) * 256
         + ((xi >> 3) & 1) * 128 + ((yi >> 3) & 1) * 64
         + ((xi >> 2) & 1) * 32 + ((yi >> 2) & 1) * 16
         + ((xi >> 1) & 1) * 8 + ((yi >> 1) & 1) * 4
         + (xi & 1) * 2 + (yi & 1) AS idx
  FROM gh0
),
gh_counts AS (
  SELECT query_id, idx, count(*)::BIGINT AS n_docs,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY count(*) DESC, idx ASC) AS rn
  FROM gh GROUP BY 1, 2
)
SELECT query_id,
       substr('0123456789bcdefghjkmnpqrstuvwxyz', (idx >> 5) + 1, 1)
       || substr('0123456789bcdefghjkmnpqrstuvwxyz', (idx & 31) + 1, 1) AS cell,
       n_docs
FROM gh_counts WHERE rn <= 10 ORDER BY 1, 3 DESC, 2
"""

# ES _geo_distance sort: match set ranked by round6 arc distance to
# (10, 20) ascending (ties doc_id asc), top-10 per query
_GEO_SORT_SQL = _MATCHES_CTE + ", " + _GEO_CTES + """,
gtopk AS (
  SELECT m.query_id, m.doc_id, g.d,
         row_number() OVER (
           PARTITION BY m.query_id ORDER BY g.d ASC, m.doc_id ASC
         ) AS rank
  FROM matches m JOIN gdist g USING (doc_id)
)
SELECT query_id, rank::BIGINT AS rank, doc_id, d AS sort_val
FROM gtopk WHERE rank <= 10
"""

# ES geo_centroid: arithmetic mean point of the match set, round6 via
# the engine's exact-sum formula (sum/count, not avg())
_GEO_CENTROID_SQL = _MATCHES_CTE + ", " + _GEO_CTES + """
SELECT m.query_id,
       round(sum(lat) / count(*), 6) AS centroid_lat,
       round(sum(lon) / count(*), 6) AS centroid_lon,
       count(*)::BIGINT AS n_docs
FROM matches m JOIN geo USING (doc_id)
GROUP BY 1 ORDER BY 1
"""

# ES geo_bounds: tightest box (top = max lat, left = min lon, bottom =
# min lat, right = max lon) — exact min/max, no float repair needed
_GEO_BOUNDS_SQL = _MATCHES_CTE + ", " + _GEO_CTES + """
SELECT m.query_id, max(lat) AS top, min(lon) AS "left",
       min(lat) AS bottom, max(lon) AS "right"
FROM matches m JOIN geo USING (doc_id)
GROUP BY 1 ORDER BY 1
"""

_MATRIX_STATS_SQL = _AGG_VALS_CTE + """
SELECT query_id, count(*)::BIGINT AS n_docs,
       round(sum(x)/count(*), 6) AS mean_x, round(sum(y)/count(*), 6) AS mean_y,
       round((count(*)*sum(x*x) - sum(x)*sum(x)) / (count(*)*count(*)), 6) AS var_x,
       round((count(*)*sum(y*y) - sum(y)*sum(y)) / (count(*)*count(*)), 6) AS var_y,
       round((count(*)*sum(x*y) - sum(x)*sum(y)) / (count(*)*count(*)), 6) AS covariance,
       round((count(*)*sum(x*y) - sum(x)*sum(y))
             / (sqrt(count(*)*sum(x*x) - sum(x)*sum(x))
                * sqrt(count(*)*sum(y*y) - sum(y)*sum(y))), 6) AS correlation
FROM vals GROUP BY 1 ORDER BY 1
"""

# ES composite sources (lang, source): first page of 8 buckets by key asc
_COMPOSITE_SQL = _AGG_VALS_CTE + """
, buckets AS (
  SELECT query_id, lang, source, count(*)::BIGINT AS n_docs,
         row_number() OVER (PARTITION BY query_id ORDER BY lang, source) AS rn
  FROM vals GROUP BY 1, 2, 3
)
SELECT query_id, lang, source, n_docs FROM buckets WHERE rn <= 8
ORDER BY query_id, lang, source
"""

# ES pipeline aggregations: date_histogram(month) buckets with a sum
# sub-agg over n_chars; the pipeline step is a window function over the
# reduced buckets (engine: driver-side reduce — the ES coordinating node)
_PIPE_BUCKETS_CTE = _AGG_VALS_CTE + """
, buckets AS (
  SELECT query_id,
         epoch(date_trunc('month', to_timestamp(ts)))::BIGINT AS bucket_ts,
         count(*)::BIGINT AS n_docs,
         sum(x) AS raw_value
  FROM vals GROUP BY 1, 2
)
"""

_CUMSUM_SQL = _PIPE_BUCKETS_CTE + """
SELECT query_id, bucket_ts, round(raw_value, 6) AS value,
       round(sum(raw_value) OVER (
         PARTITION BY query_id ORDER BY bucket_ts), 6) AS cumulative
FROM buckets ORDER BY 1, 2
"""

_DERIV_SQL = _PIPE_BUCKETS_CTE + """
SELECT query_id, bucket_ts, round(raw_value, 6) AS value, deriv FROM (
  SELECT query_id, bucket_ts, raw_value,
         round(raw_value - lag(raw_value) OVER (
           PARTITION BY query_id ORDER BY bucket_ts), 6) AS deriv
  FROM buckets
) WHERE deriv IS NOT NULL ORDER BY 1, 2
"""

_BUCKET_SCRIPT_SQL = _PIPE_BUCKETS_CTE + """
SELECT query_id, bucket_ts, n_docs, round(raw_value, 6) AS value,
       round(raw_value / n_docs, 6) AS avg_val
FROM buckets WHERE n_docs >= 5 ORDER BY 1, 2
"""

_STATS_BUCKET_SQL = _PIPE_BUCKETS_CTE + """
SELECT query_id, count(*)::BIGINT AS n_buckets,
       round(min(raw_value), 6) AS min_val, round(max(raw_value), 6) AS max_val,
       round(sum(raw_value), 6) AS sum_val,
       round(sum(raw_value) / count(*), 6) AS avg_val
FROM buckets GROUP BY 1 ORDER BY 1
"""

# ES extended_stats_bucket: stats_bucket + sum_of_squares, POPULATION
# variance/std (the ES rule) and the ±2σ bounds over the bucket sums
_EXT_STATS_BUCKET_SQL = _PIPE_BUCKETS_CTE + """
SELECT query_id, count(*)::BIGINT AS n_buckets,
       round(min(raw_value), 6) AS min_val, round(max(raw_value), 6) AS max_val,
       round(sum(raw_value), 6) AS sum_val, round(avg(raw_value), 6) AS avg_val,
       round(sum(raw_value * raw_value), 6) AS sum_sq,
       round(var_pop(raw_value), 6) AS variance,
       round(stddev_pop(raw_value), 6) AS std_dev,
       round(avg(raw_value) + 2 * stddev_pop(raw_value), 6) AS std_upper,
       round(avg(raw_value) - 2 * stddev_pop(raw_value), 6) AS std_lower
FROM buckets GROUP BY 1 ORDER BY 1
"""

# ES percentiles_bucket: nearest-rank (no interpolation) percentile of
# the sorted per-month sum sub-agg values; index round = floor(x + 0.5)
# half-away, the engine's round convention
_PCTL_BUCKET_SQL = _PIPE_BUCKETS_CTE + """
, l AS (
  SELECT query_id, list(raw_value ORDER BY raw_value) AS vs
  FROM buckets GROUP BY 1
)
SELECT query_id, p.percent,
       round(vs[(floor(p.percent / 100.0 * (len(vs) - 1) + 0.5))::BIGINT + 1], 6) AS value
FROM l, (SELECT unnest([25.0, 50.0, 75.0, 99.0]) AS percent) p
ORDER BY 1, 2
"""

# ES moving_percentiles (window includes the current bucket, shift=1):
# trailing 3-bucket nearest-rank p50 of the per-month sum sub-agg —
# same index rule as percentiles_bucket, applied to the sorted window
_MOVING_PCTL_SQL = _PIPE_BUCKETS_CTE + """
SELECT query_id, bucket_ts, round(raw_value, 6) AS value,
       round(w[(floor(50.0 / 100.0 * (len(w) - 1) + 0.5))::BIGINT + 1], 6)
         AS moving_pct
FROM (
  SELECT query_id, bucket_ts, raw_value,
         list_sort(list(raw_value::DOUBLE) OVER (
           PARTITION BY query_id ORDER BY bucket_ts
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS w
  FROM buckets
) ORDER BY 1, 2
"""

# ES max_bucket: per query the bucket key(s) attaining the max of the
# per-month sum sub-agg (ES returns a keys ARRAY on ties → one row per
# attaining bucket), compared raw, rounded on output
# ES avg_bucket / sum_bucket sibling pipeline aggregations: one scalar
# per query folding the per-month sum sub-agg values (gap_policy=skip)
_AVG_BUCKET_SQL = _PIPE_BUCKETS_CTE + """
SELECT query_id, round(avg(raw_value), 6) AS value
FROM buckets GROUP BY 1 ORDER BY 1
"""

_SUM_BUCKET_SQL = _PIPE_BUCKETS_CTE + """
SELECT query_id, round(sum(raw_value), 6) AS value
FROM buckets GROUP BY 1 ORDER BY 1
"""

_MAX_BUCKET_SQL = _PIPE_BUCKETS_CTE + """
SELECT query_id, bucket_ts, round(raw_value, 6) AS value
FROM (SELECT *, max(raw_value) OVER (PARTITION BY query_id) AS m FROM buckets)
WHERE raw_value = m ORDER BY 1, 2
"""

_MIN_BUCKET_SQL = _PIPE_BUCKETS_CTE + """
SELECT query_id, bucket_ts, round(raw_value, 6) AS value
FROM (SELECT *, min(raw_value) OVER (PARTITION BY query_id) AS m FROM buckets)
WHERE raw_value = m ORDER BY 1, 2
"""

# ES moving_fn (unweightedAvg, window includes the current bucket):
# trailing 3-bucket mean of the per-month sum sub-agg
_MOVING_FN_SQL = _PIPE_BUCKETS_CTE + """
SELECT query_id, bucket_ts, round(raw_value, 6) AS value,
       round(avg(raw_value) OVER (
         PARTITION BY query_id ORDER BY bucket_ts
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving
FROM buckets ORDER BY 1, 2
"""

# ES serial_diff (lag=2): change of the sum sub-agg vs two buckets back
_SERIAL_DIFF_SQL = _PIPE_BUCKETS_CTE + """
SELECT query_id, bucket_ts, round(raw_value, 6) AS value, sdiff FROM (
  SELECT query_id, bucket_ts, raw_value,
         round(raw_value - lag(raw_value, 2) OVER (
           PARTITION BY query_id ORDER BY bucket_ts), 6) AS sdiff
  FROM buckets
) WHERE sdiff IS NOT NULL ORDER BY 1, 2
"""

# ES auto_date_histogram (target 8): per-query interval picked from the
# day-bucket roll-up counts (the engine's exact-day-union rule)
_AUTO_DH_SQL = _AGG_VALS_CTE + """
, days AS (
  SELECT query_id,
         epoch(date_trunc('day', to_timestamp(ts)))::BIGINT AS d,
         count(*)::BIGINT AS n
  FROM vals GROUP BY 1, 2
),
choices AS (
  SELECT query_id,
         count(*) AS n_day,
         count(DISTINCT epoch(date_trunc('week', to_timestamp(d)))) AS n_week,
         count(DISTINCT epoch(date_trunc('month', to_timestamp(d)))) AS n_month
  FROM days GROUP BY 1
),
pick AS (
  SELECT query_id,
         CASE WHEN n_day <= 8 THEN 'day' WHEN n_week <= 8 THEN 'week'
              WHEN n_month <= 8 THEN 'month' ELSE 'year' END AS iv
  FROM choices
)
SELECT d.query_id, p.iv AS interval,
       epoch(date_trunc(p.iv, to_timestamp(d.d)))::BIGINT AS bucket_ts,
       sum(d.n)::BIGINT AS n_docs
FROM days d JOIN pick p USING (query_id)
GROUP BY 1, 2, 3 ORDER BY 1, 3
"""

# ES bucket_sort: top-3 month buckets by the sum sub-agg desc (ties
# bucket_ts asc) per query
_BUCKET_SORT_SQL = _PIPE_BUCKETS_CTE + """
SELECT query_id, bucket_ts, n_docs, round(raw_value, 6) AS value FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY raw_value DESC, bucket_ts ASC) AS rn
  FROM buckets
) WHERE rn <= 3 ORDER BY 1, 2
"""

# ES normalize (percent_of_sum): per-bucket share of the query's total
_NORMALIZE_SQL = _PIPE_BUCKETS_CTE + """
SELECT query_id, bucket_ts, round(raw_value, 6) AS value,
       round(raw_value / sum(raw_value) OVER (PARTITION BY query_id), 6)
         AS normalized
FROM buckets ORDER BY 1, 2
"""

# ES weighted_avg: n_chars weighted by the analyzer token count, pairwise
# missing exclusion (neither column is NULL here, so plain sums)
_WEIGHTED_AVG_SQL = _AGG_VALS_CTE + """
SELECT query_id, count(*)::BIGINT AS n_docs,
       round(sum(x*y) / sum(y), 6) AS weighted_avg
FROM vals GROUP BY 1 ORDER BY 1
"""

# ES string_stats over lang: lengths + Shannon char entropy per match set
_STRING_STATS_SQL = _MATCHES_CTE + """
, vals AS (
  SELECT m.query_id, d.lang AS v
  FROM matches m JOIN documents d USING (doc_id)
),
freq AS (
  SELECT query_id, c, count(*)::DOUBLE AS cnt
  FROM (SELECT query_id, unnest(string_split(v, '')) AS c FROM vals)
  GROUP BY 1, 2
),
tot AS (SELECT query_id, sum(cnt) AS t FROM freq GROUP BY 1),
ent AS (
  SELECT f.query_id, -sum((cnt / t) * log2(cnt / t)) AS e
  FROM freq f JOIN tot USING (query_id) GROUP BY 1
)
SELECT v.query_id, count(*)::BIGINT AS n_values,
       min(length(v.v))::BIGINT AS min_len,
       max(length(v.v))::BIGINT AS max_len,
       round(sum(length(v.v))::DOUBLE / count(*), 6) AS avg_len,
       round(any_value(ent.e), 6) AS entropy
FROM vals v JOIN ent USING (query_id) GROUP BY 1 ORDER BY 1
"""

# ES top_metrics: n_chars of the top-2 docs by ts desc (ties doc_id asc)
_TOP_METRICS_SQL = _AGG_VALS_CTE + """
SELECT query_id, rank::BIGINT AS rank, sort_val, n_chars FROM (
  SELECT query_id, ts::DOUBLE AS sort_val, x AS n_chars,
         row_number() OVER (
           PARTITION BY query_id ORDER BY ts DESC, doc_id ASC) AS rank
  FROM vals
) WHERE rank <= 2 ORDER BY 1, 2
"""

# ES pinned query: _ids 3 and 11 promoted with constant descending
# scores; organic BM25 follows with pinned docs deduped out, k=10 total
_PINNED_SQL = _BM25_SQL.split("topk AS (")[0] + """pins(key_id, pos) AS (VALUES (3, 1), (11, 2)),
organic AS (
  SELECT s.query_id, s.doc_id, round(s.raw_score, 6) AS score,
         row_number() OVER (PARTITION BY s.query_id
           ORDER BY round(s.raw_score, 6) DESC, s.doc_id ASC) AS orank
  FROM scores s WHERE s.doc_id NOT IN (SELECT key_id FROM pins)
),
qids AS (SELECT DISTINCT query_id FROM queries),
pinned_rows AS (
  SELECT q.query_id, p.pos AS rank, p.key_id AS doc_id,
         CAST(p.key_id AS VARCHAR) AS key,
         (1000000 - (p.pos - 1))::DOUBLE AS score
  FROM qids q CROSS JOIN pins p
),
organic_rows AS (
  SELECT query_id, 2 + orank AS rank, doc_id,
         CAST(doc_id AS VARCHAR) AS key, score
  FROM organic WHERE orank <= 8
)
SELECT query_id, rank::BIGINT AS rank, doc_id, key, score FROM pinned_rows
UNION ALL
SELECT query_id, rank::BIGINT, doc_id, key, score FROM organic_rows
ORDER BY 1, 2
"""

# ES multi_terms: (lang, source) tuple buckets, n desc then key asc, top 10
_MULTI_TERMS_SQL = _MATCHES_CTE + """
, vals AS (
  SELECT m.query_id, d.lang, d.source
  FROM matches m JOIN documents d USING (doc_id)
),
buckets AS (
  SELECT query_id, lang, source, count(*)::BIGINT AS n_docs,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY count(*) DESC, lang ASC, source ASC) AS rn
  FROM vals GROUP BY 1, 2, 3
)
SELECT query_id, lang, source, n_docs FROM buckets WHERE rn <= 10
ORDER BY 1, 2, 3
"""

# ES median_absolute_deviation (exact nearest-rank == quantile_disc)
_MAD_SQL = _AGG_VALS_CTE + """
, med AS (SELECT query_id, quantile_disc(x, 0.5) AS m FROM vals GROUP BY 1)
SELECT v.query_id, med.m AS median,
       quantile_disc(abs(v.x - med.m), 0.5) AS mad
FROM vals v JOIN med USING (query_id) GROUP BY 1, 2 ORDER BY 1
"""

_TERMS_SIZE_SQL = _MATCHES_CTE + """
, b AS (
  SELECT m.query_id, d.source AS value, count(*)::BIGINT AS n_docs,
         row_number() OVER (
           PARTITION BY m.query_id ORDER BY count(*) DESC, d.source ASC
         ) AS r
  FROM matches m JOIN documents d USING (doc_id)
  GROUP BY 1, 2
)
SELECT query_id, value, n_docs, 0::BIGINT AS doc_count_error_upper_bound
FROM b WHERE r <= 5 ORDER BY 1, 3 DESC, 2
"""

_SCRIPTED_METRIC_SQL = _AGG_VALS_CTE + """
SELECT query_id, count(*)::BIGINT AS n_docs,
       round(sum(x * 2.0 + 10.0), 6) AS value,
       round(min(x * 2.0 + 10.0), 6) AS min_val,
       round(max(x * 2.0 + 10.0), 6) AS max_val
FROM vals GROUP BY 1 ORDER BY 1
"""

_GLOBAL_AGG_SQL = """
WITH toks AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
tf AS (SELECT DISTINCT doc_id, term FROM toks),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
ranked_terms AS (
  SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df
),
m0 AS (
  SELECT DISTINCT tf.doc_id FROM tf
  JOIN ranked_terms rt ON rt.term = tf.term AND rt.r = 1
),
u AS (
  SELECT 0 AS query_id, d.lang FROM m0 JOIN documents d USING (doc_id)
  UNION ALL SELECT 1, lang FROM documents
)
SELECT query_id::BIGINT AS query_id, lang AS value, count(*)::BIGINT AS n_docs
FROM u GROUP BY 1, 2 ORDER BY 1, 3 DESC, 2
""".replace("{_TOK}", _TOK)

_RATE_SQL = _AGG_VALS_CTE + """
, b AS (
  SELECT query_id,
         epoch(date_trunc('month', to_timestamp(ts)))::BIGINT AS bucket_ts,
         count(*)::BIGINT AS n_docs
  FROM vals GROUP BY 1, 2
)
SELECT query_id, bucket_ts, n_docs,
       round(n_docs::DOUBLE / day(last_day(to_timestamp(bucket_ts))), 6) AS rate
FROM b ORDER BY 1, 2
"""

_DATE_RANGE_SQL = _AGG_VALS_CTE + """
SELECT query_id,
       CASE WHEN ts >= 1588291200 THEN 1588291200.0
            WHEN ts >= 1583020800 THEN 1583020800.0
            ELSE 1577836800.0 END AS range_from,
       count(*)::BIGINT AS n_docs
FROM vals WHERE ts >= 1577836800 GROUP BY 1, 2 ORDER BY 1, 2
"""

# Welch t-test: sample variance via the SAME exact-sum formula as the
# engine — (ss - s*s/n)/(n-1) — so doubles match before the 6dp round
_TTEST_SQL = _AGG_VALS_CTE + """
, m AS (
  SELECT query_id, count(*)::DOUBLE AS n, sum(x) AS s, sum(x*x) AS ss
  FROM vals GROUP BY 1
),
pairs(qa, qb) AS (VALUES (0, 1), (2, 3))
SELECT p.qa::BIGINT AS query_a, p.qb::BIGINT AS query_b,
       round((a.s/a.n - b.s/b.n)
             / sqrt(((a.ss - a.s*a.s/a.n)/(a.n-1))/a.n
                    + ((b.ss - b.s*b.s/b.n)/(b.n-1))/b.n), 6) AS t_value,
       round(pow(((a.ss - a.s*a.s/a.n)/(a.n-1))/a.n
                 + ((b.ss - b.s*b.s/b.n)/(b.n-1))/b.n, 2)
             / (pow(((a.ss - a.s*a.s/a.n)/(a.n-1))/a.n, 2)/(a.n-1)
                + pow(((b.ss - b.s*b.s/b.n)/(b.n-1))/b.n, 2)/(b.n-1)), 6) AS dof
FROM pairs p JOIN m a ON a.query_id = p.qa JOIN m b ON b.query_id = p.qb
WHERE a.n >= 2 AND b.n >= 2 ORDER BY 1, 2
"""

_BOXPLOT_SQL = _AGG_VALS_CTE + """
, q AS (
  SELECT query_id, min(x) AS min_val, max(x) AS max_val,
         quantile_disc(x, 0.25) AS q1, quantile_disc(x, 0.5) AS q2,
         quantile_disc(x, 0.75) AS q3
  FROM vals GROUP BY 1
)
SELECT q.query_id, q.min_val, q.max_val, q.q1, q.q2, q.q3,
       min(v.x) FILTER (WHERE v.x >= q.q1 - 1.5*(q.q3-q.q1)
                          AND v.x <= q.q3 + 1.5*(q.q3-q.q1)) AS lower_whisker,
       max(v.x) FILTER (WHERE v.x >= q.q1 - 1.5*(q.q3-q.q1)
                          AND v.x <= q.q3 + 1.5*(q.q3-q.q1)) AS upper_whisker
FROM q JOIN vals v USING (query_id)
GROUP BY 1, 2, 3, 4, 5, 6 ORDER BY 1
"""

# ES missing / value_count over the deterministically-nulled n_chars
# (doc_id % 7 == 0 — mirrors _missing_index_build)
_MISSING_AGG_SQL = _MATCHES_CTE + """
SELECT m.query_id,
       count(*) FILTER (WHERE d.doc_id % 7 = 0)::BIGINT AS n_missing,
       count(*)::BIGINT AS n_docs
FROM matches m JOIN documents d USING (doc_id) GROUP BY 1 ORDER BY 1
"""

_VALUE_COUNT_SQL = _MATCHES_CTE + """
SELECT m.query_id,
       count(*) FILTER (WHERE d.doc_id % 7 <> 0)::BIGINT AS n_values
FROM matches m JOIN documents d USING (doc_id) GROUP BY 1 ORDER BY 1
"""

# ES _explain of each query's rank-1 hit: per matched term, df / tf and
# the BM25 contribution round6'd with the engine's exact arithmetic
_EXPLAIN_SQL = _BM25_SQL.split("topk AS (")[0] + """topk AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(raw_score, 6) DESC, doc_id ASC
         ) AS rank
  FROM scores
),
top1 AS (SELECT query_id, doc_id FROM topk WHERE rank = 1)
SELECT q.query_id, t1.doc_id, q.term, df.df::BIGINT AS df, tf.tf::BIGINT AS tf,
       round(
         ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
         * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)), 6
       ) AS contribution
FROM queries q
JOIN top1 t1 USING (query_id)
JOIN tf ON tf.term = q.term AND tf.doc_id = t1.doc_id
JOIN df ON df.term = q.term
JOIN dl ON dl.doc_id = t1.doc_id
CROSS JOIN stats s
ORDER BY 1, 2, 3
"""

# ES scroll: the FULL ranked match list (no top-k cap)
_SCROLL_SQL = _BM25_SQL.replace("FROM topk WHERE rank <= 10", "FROM topk")
assert "WHERE rank <= 10" not in _SCROLL_SQL

# ES sliced scroll (slice max=3): slice = md5_number_lower(doc_id) % 3
# (the repo-wide sampling/SimHash hash contract), rank LOCAL to the
# (query, slice) in (score desc, doc_id asc) order
_SLICED_SCROLL_SQL = _SCROLL_SQL.replace(
    "SELECT query_id, rank::BIGINT AS rank, doc_id, score\nFROM topk",
    """SELECT query_id,
       (md5_number_lower(CAST(doc_id AS VARCHAR)) % 3)::BIGINT AS slice_id,
       row_number() OVER (
         PARTITION BY query_id, md5_number_lower(CAST(doc_id AS VARCHAR)) % 3
         ORDER BY score DESC, doc_id ASC
       )::BIGINT AS rank, doc_id, score
FROM topk""",
)
assert "slice_id" in _SLICED_SCROLL_SQL  # replace anchor must exist

# ES function_score random_score: deterministic seeded score per
# (seed=42, doc_id) over each derived match set — score =
# (md5_number_lower('42:' || doc_id) % 1e6) / 1e6 (the sampling-ops md5
# contract), top-10 by score desc, ties doc_id asc
_RANDOM_SCORE_SQL = _MATCHES_CTE + """
, scored AS (
  SELECT query_id, doc_id,
         round((md5_number_lower('42:' || doc_id) % 1000000) / 1000000.0, 6) AS score
  FROM matches
),
topk AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rank
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM topk WHERE rank <= 10 ORDER BY 1, 2
"""


# ES constant_score: every matching doc scores the boost (1.5); ties
# break doc_id asc, so top-k = the k smallest matching doc_ids
_CONST_SQL = _MATCHES_CTE + """
, ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY doc_id ASC) AS rank
  FROM matches
)
SELECT query_id, rank::BIGINT AS rank, doc_id, 1.5 AS score
FROM ranked WHERE rank <= 10 ORDER BY 1, 2
"""

# ES boosting: positive = the derived BM25 queries; docs containing the
# corpus's top-df term are demoted by x0.4 (round6 after the multiply,
# matching the engine's round6(round6(raw) * nb))
_BOOSTING_SQL = _BM25_SQL.split("topk AS (")[0] + """neg AS (
  SELECT DISTINCT tf.doc_id
  FROM ranked_terms rt JOIN tf ON tf.term = rt.term WHERE rt.r = 1
),
demoted AS (
  SELECT s.query_id, s.doc_id,
         CASE WHEN n.doc_id IS NOT NULL
              THEN round(round(s.raw_score, 6) * 0.4, 6)
              ELSE round(s.raw_score, 6) END AS score
  FROM scores s LEFT JOIN neg n ON n.doc_id = s.doc_id
),
topk AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rank
  FROM demoted
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM topk WHERE rank <= 10
"""

# ES terms_set: >= msm of the given terms must match; score = round6 of
# the sum of the matched terms' round6'd BM25 (single-term bool clauses)
_TERMS_SET_SQL = _BM25_SQL.split("queries AS (")[0] + """tsq AS (
  SELECT v.query_id, rt.term
  FROM (VALUES
    (0,1),(0,2),(0,3),(0,4),(0,5),
    (1,2),(1,3),(1,4),(1,5),(1,6),
    (2,4),(2,5),(2,6),(2,7),(2,8),
    (3,5),(3,6),(3,7),(3,8)
  ) AS v(query_id, r)
  JOIN ranked_terms rt ON rt.r = v.r
),
params AS (
  SELECT * FROM (VALUES (0, 3), (1, 2), (2, 4), (3, 2)) AS p(query_id, msm)
),
cs AS (
  SELECT q.query_id, tf.doc_id, q.term,
         round(
           ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)), 6
         ) AS c
  FROM tsq q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
matched AS (
  SELECT query_id, doc_id, count(*) AS n_m, round(sum(c), 6) AS score
  FROM cs GROUP BY 1, 2
),
topk AS (
  SELECT m.query_id, m.doc_id, m.score,
         row_number() OVER (
           PARTITION BY m.query_id ORDER BY m.score DESC, m.doc_id ASC
         ) AS rank
  FROM matched m JOIN params p ON p.query_id = m.query_id
  WHERE m.n_m >= p.msm
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM topk WHERE rank <= 10
"""

# ES match_bool_prefix: complete terms score BM25 (round6'd sum), the
# final token's 3-char prefix clause adds 1.0 per matching doc (the
# constant_score multi-term rewrite); candidates = either side
_MBP_SQL = _BM25_SQL.split("queries AS (")[0] + """rest AS (
  SELECT v.query_id, rt.term
  FROM (VALUES
    (0,1), (1,2),(1,3), (2,4),(2,5),(2,6), (3,7),(3,8)
  ) AS v(query_id, r)
  JOIN ranked_terms rt ON rt.r = v.r
),
qpfx AS (
  SELECT v.query_id, substr(rt.term, 1, 3) AS p
  FROM (VALUES (0,2), (1,4), (2,7), (3,1)) AS v(query_id, r)
  JOIN ranked_terms rt ON rt.r = v.r
),
base AS (
  SELECT q.query_id, tf.doc_id,
         round(sum(
           ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
         ), 6) AS bscore
  FROM rest q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
pmatch AS (
  SELECT DISTINCT q.query_id, tf.doc_id
  FROM qpfx q JOIN tf ON tf.term LIKE q.p || '%'
),
cand AS (
  SELECT coalesce(b.query_id, p.query_id) AS query_id,
         coalesce(b.doc_id, p.doc_id) AS doc_id,
         round(
           coalesce(b.bscore, 0)
           + CASE WHEN p.doc_id IS NOT NULL THEN 1.0 ELSE 0.0 END, 6
         ) AS score
  FROM base b
  FULL JOIN pmatch p ON p.query_id = b.query_id AND p.doc_id = b.doc_id
),
topk AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rank
  FROM cand
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM topk WHERE rank <= 10
"""


# ES significant_text aggregation: per match set (the foreground), terms
# whose fg doc frequency is disproportionately high vs the whole corpus
# (the background), JLH-scored (fg% - bg%) * (fg% / bg%); min_doc_count=3
# (the ES default); significance cut decided by exact integer
# cross-multiplication on BOTH sides (fg*N > bg*fgN)
_SIGTEXT_SQL = _MATCHES_CTE + """
, fgn AS (
  SELECT query_id, count(*)::BIGINT AS fgn FROM matches GROUP BY 1
),
bgn AS (SELECT count(*)::BIGINT AS bgn FROM documents),
fg AS (
  SELECT m.query_id, tf.term, count(*)::BIGINT AS fg_count
  FROM matches m JOIN tf ON tf.doc_id = m.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT f.query_id, f.term, f.fg_count, df.df::BIGINT AS bg_count,
         round(
           (f.fg_count / (g.fgn * 1.0) - df.df / (b.bgn * 1.0))
           * ((f.fg_count / (g.fgn * 1.0)) / (df.df / (b.bgn * 1.0))), 6
         ) AS score
  FROM fg f
  JOIN df USING (term)
  JOIN fgn g USING (query_id)
  CROSS JOIN bgn b
  WHERE f.fg_count >= 3 AND f.fg_count * b.bgn > df.df::BIGINT * g.fgn
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, term ASC) AS rank
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, term, fg_count, bg_count, score
FROM ranked WHERE rank <= 10
"""

# ES categorize_text aggregation: per match set, docs grouped by the
# engine's frozen categorization key (first 5 digit-free analyzer tokens
# joined by spaces — the deterministic analog of ES's drain-style log
# grouping), top-10 by (doc_count desc, category asc)
_CATEGORIZE_TEXT_SQL = _MATCHES_CTE + """
, keys AS (
  SELECT m.query_id,
         array_to_string(list_slice(list_filter(
           list_filter(regexp_split_to_array(lower(d.text), '[^a-z0-9]+'),
                       x -> x <> ''),
           x -> NOT regexp_matches(x, '[0-9]')), 1, 5), ' ') AS category
  FROM matches m JOIN documents d USING (doc_id)
),
counts AS (
  SELECT query_id, category, count(*)::BIGINT AS doc_count
  FROM keys WHERE category <> '' GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY doc_count DESC, category ASC) AS rank
  FROM counts
)
SELECT query_id, rank::BIGINT AS rank, category, doc_count
FROM ranked WHERE rank <= 10
"""

# ES significant_terms over the source keyword field: JLH vs the whole
# corpus, min_doc_count=3, exact integer significance cut; ties value asc
_SIGTERMS_KW_SQL = _MATCHES_CTE + """
, fg AS (
  SELECT m.query_id, d.source AS value, count(*)::BIGINT AS fg_count
  FROM matches m JOIN documents d USING (doc_id) GROUP BY 1, 2
),
fgn AS (SELECT query_id, sum(fg_count)::BIGINT AS fgn FROM fg GROUP BY 1),
bg AS (SELECT source AS value, count(*)::BIGINT AS bg_count FROM documents GROUP BY 1),
nn AS (SELECT count(*)::BIGINT AS n FROM documents),
scored AS (
  SELECT f.query_id, f.value, f.fg_count, b.bg_count,
         round(
           (f.fg_count / (g.fgn * 1.0) - b.bg_count / (nn.n * 1.0))
           * ((f.fg_count / (g.fgn * 1.0)) / (b.bg_count / (nn.n * 1.0))), 6
         ) AS score
  FROM fg f JOIN fgn g USING (query_id) JOIN bg b USING (value) CROSS JOIN nn
  WHERE f.fg_count >= 3 AND f.fg_count * nn.n > b.bg_count * g.fgn
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, value ASC) AS rank
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, value, fg_count, bg_count, score
FROM ranked WHERE rank <= 10
"""

# ES significance heuristics over the same fg/bg CTE: the superset 2x2
# contingency a=fg_count, b=fgn-a, c=bg_count-a, d=(n-fgn)-c
_SIG_CELLS = """
scored AS (
  SELECT f.query_id, f.value, f.fg_count, b.bg_count,
         f.fg_count * 1.0 AS a, (g.fgn - f.fg_count) * 1.0 AS bb,
         (b.bg_count - f.fg_count) * 1.0 AS c,
         ((nn.n - g.fgn) - (b.bg_count - f.fg_count)) * 1.0 AS d,
         nn.n * 1.0 AS nt
  FROM fg f JOIN fgn g USING (query_id) JOIN bg b USING (value) CROSS JOIN nn
  WHERE f.fg_count >= 3 AND f.fg_count * nn.n > b.bg_count * g.fgn
),
"""

_SIGTERMS_CHI2_SQL = _SIGTERMS_KW_SQL.split(",\nscored AS (")[0] + ",\n" + _SIG_CELLS + """
final AS (
  SELECT query_id, value, fg_count, bg_count,
         round(CASE WHEN (a+bb)*(c+d)*(a+c)*(bb+d) > 0
               THEN nt * (a*d - bb*c) * (a*d - bb*c)
                    / ((a+bb)*(c+d)*(a+c)*(bb+d))
               ELSE 0 END, 6) AS score
  FROM scored
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, value ASC) AS rank
  FROM final
)
SELECT query_id, rank::BIGINT AS rank, value, fg_count, bg_count, score
FROM ranked WHERE rank <= 10
"""
# the split anchor must exist in the SOURCE sql (checking the
# concatenated result would be vacuous — _SIG_CELLS contains it too)
assert ",\nscored AS (" in _SIGTERMS_KW_SQL

_SIGTERMS_MI_SQL = _SIGTERMS_KW_SQL.split(",\nscored AS (")[0] + ",\n" + _SIG_CELLS + """
final AS (
  SELECT query_id, value, fg_count, bg_count,
         round(
           (CASE WHEN a  > 0 THEN (a/nt)  * log2(a*nt  / ((a+bb)*(a+c)))  ELSE 0 END)
         + (CASE WHEN bb > 0 THEN (bb/nt) * log2(bb*nt / ((a+bb)*(bb+d))) ELSE 0 END)
         + (CASE WHEN c  > 0 THEN (c/nt)  * log2(c*nt  / ((c+d)*(a+c)))   ELSE 0 END)
         + (CASE WHEN d  > 0 THEN (d/nt)  * log2(d*nt  / ((c+d)*(bb+d)))  ELSE 0 END)
         , 6) AS score
  FROM scored
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, value ASC) AS rank
  FROM final
)
SELECT query_id, rank::BIGINT AS rank, value, fg_count, bg_count, score
FROM ranked WHERE rank <= 10
"""


# ES rare_terms: match-set terms with global df <= the 5th-smallest
# distinct df (OFFSET 4; coalesce to max df when fewer distinct values),
# ranked rarest-first (df asc, term asc)
_RARE_TERMS_SQL = _MATCHES_CTE + """
, th AS (
  SELECT coalesce(
    (SELECT df FROM (SELECT DISTINCT df FROM df ORDER BY df LIMIT 1 OFFSET 4)),
    (SELECT max(df) FROM df)
  ) AS t
),
fg AS (
  SELECT m.query_id, tf.term, count(*)::BIGINT AS fg_count
  FROM matches m JOIN tf ON tf.doc_id = m.doc_id
  GROUP BY 1, 2
),
rare AS (
  SELECT f.query_id, f.term, f.fg_count, df.df::BIGINT AS bg_count
  FROM fg f JOIN df USING (term) CROSS JOIN th
  WHERE df.df <= th.t
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY bg_count ASC, term ASC) AS rank
  FROM rare
)
SELECT query_id, rank::BIGINT AS rank, term, fg_count, bg_count
FROM ranked WHERE rank <= 10
"""

# ES cardinality aggregation (exact flavor): COUNT(DISTINCT lang) per
# match set, zero for queries matching nothing
_CARDINALITY_SQL = _MATCHES_CTE + """
SELECT q.query_id, coalesce(c.n_distinct, 0)::BIGINT AS n_distinct
FROM (SELECT DISTINCT query_id FROM queries) q
LEFT JOIN (
  SELECT m.query_id, count(DISTINCT d.lang)::BIGINT AS n_distinct
  FROM matches m JOIN documents d USING (doc_id)
  GROUP BY 1
) c USING (query_id)
ORDER BY 1
"""

# ES percolate: (doc, query) match pairs; queries 0-3 or-match, query 4
# = query 1's terms with operator=and
_PERCOLATE_SQL = _MATCHES_CTE + """
, and_q AS (
  SELECT tf.doc_id FROM tf
  JOIN queries q ON q.query_id = 1 AND q.term = tf.term
  GROUP BY tf.doc_id
  HAVING count(DISTINCT tf.term) = (SELECT count(*) FROM queries WHERE query_id = 1)
)
SELECT doc_id, query_id::BIGINT AS query_id FROM matches
UNION ALL
SELECT doc_id, 4::BIGINT FROM and_q
ORDER BY 1, 2
"""

# ES stats aggregation: count/min/max/sum/avg of n_chars per match set
_STATS_AGG_SQL = _MATCHES_CTE + """
SELECT m.query_id,
       count(*)::BIGINT AS n_docs,
       min(d.n_chars)::DOUBLE AS min_val,
       max(d.n_chars)::DOUBLE AS max_val,
       sum(d.n_chars)::DOUBLE AS sum_val,
       round(sum(d.n_chars)::DOUBLE / count(*), 6) AS avg_val
FROM matches m JOIN documents d USING (doc_id)
WHERE d.n_chars IS NOT NULL
GROUP BY 1 ORDER BY 1
"""

# ES percentiles aggregation: nearest-rank == DuckDB quantile_disc
_PERCENTILES_SQL = _MATCHES_CTE + """
, mvals AS (
  SELECT m.query_id, d.n_chars
  FROM matches m JOIN documents d USING (doc_id)
  WHERE d.n_chars IS NOT NULL
)
SELECT query_id, pct, value FROM (
  SELECT query_id, 25.0 AS pct, quantile_disc(n_chars, 0.25)::DOUBLE AS value FROM mvals GROUP BY 1
  UNION ALL
  SELECT query_id, 50.0, quantile_disc(n_chars, 0.50)::DOUBLE FROM mvals GROUP BY 1
  UNION ALL
  SELECT query_id, 75.0, quantile_disc(n_chars, 0.75)::DOUBLE FROM mvals GROUP BY 1
  UNION ALL
  SELECT query_id, 99.0, quantile_disc(n_chars, 0.99)::DOUBLE FROM mvals GROUP BY 1
) ORDER BY 1, 2
"""

# ES percentile_ranks (exact, inverse of percentiles): percent of the
# match set's n_chars values <= each requested v
_PCT_RANKS_SQL = _MATCHES_CTE + """
, mvals AS (
  SELECT m.query_id, d.n_chars
  FROM matches m JOIN documents d USING (doc_id)
  WHERE d.n_chars IS NOT NULL
)
SELECT query_id, v AS value,
       round(100.0 * count(*) FILTER (WHERE n_chars <= v) / count(*), 6) AS pct
FROM mvals CROSS JOIN (SELECT unnest([200.0, 350.0, 500.0]) AS v) vs
GROUP BY 1, 2 ORDER BY 1, 2
"""

# ES sub-aggregation: terms(lang) bucket -> nested stats(n_chars)
_SUBAGG_SQL = _MATCHES_CTE + """
SELECT m.query_id, d.lang AS value,
       count(*)::BIGINT AS n_docs,
       min(d.n_chars)::DOUBLE AS min_val,
       max(d.n_chars)::DOUBLE AS max_val,
       sum(d.n_chars)::DOUBLE AS sum_val,
       round(sum(d.n_chars)::DOUBLE / count(*), 6) AS avg_val
FROM matches m JOIN documents d USING (doc_id)
WHERE d.n_chars IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 3 DESC, 2
"""

# ES histogram aggregation: interval-50 buckets of n_chars per match set
_HISTOGRAM_SQL = _MATCHES_CTE + """
SELECT m.query_id,
       (floor(d.n_chars / 50.0) * 50.0)::DOUBLE AS bucket,
       count(*)::BIGINT AS n_docs
FROM matches m JOIN documents d USING (doc_id)
WHERE d.n_chars IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""

# ES sort-by-field: match set (operator=or) ranked by n_chars desc,
# ties doc_id asc, missing excluded — mirrors run_sorted exactly
_SORT_FIELD_SQL = """
WITH toks AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
tf AS (SELECT DISTINCT doc_id, term FROM toks),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
ranked_terms AS (
  SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df
),
queries AS (
  SELECT 0 AS query_id, term FROM ranked_terms WHERE r = 1
  UNION ALL SELECT 1, term FROM ranked_terms WHERE r IN (2, 3)
  UNION ALL SELECT 2, term FROM ranked_terms WHERE r IN (4, 5, 6)
  UNION ALL SELECT 3, term FROM ranked_terms WHERE r IN (7, 8)
),
matches AS (
  SELECT DISTINCT q.query_id, tf.doc_id FROM queries q JOIN tf ON tf.term = q.term
),
topk AS (
  SELECT m.query_id, m.doc_id, d.n_chars,
         row_number() OVER (
           PARTITION BY m.query_id ORDER BY d.n_chars DESC, m.doc_id ASC
         ) AS rank
  FROM matches m JOIN documents d USING (doc_id)
  WHERE d.n_chars IS NOT NULL
)
SELECT query_id, rank::BIGINT AS rank, doc_id, n_chars::DOUBLE AS sort_val
FROM topk WHERE rank <= 10
""".replace("{_TOK}", _TOK)

# ES sort + search_after page 2: global sort ranks 6-10 fetched with the
# (sort_val, doc_id) cursor of page 1's last hit; returned ranks restart
# at 1 (ES semantics)
_SORT_AFTER_SQL = _SORT_FIELD_SQL.replace(
    "SELECT query_id, rank::BIGINT AS rank, doc_id, n_chars::DOUBLE AS sort_val\nFROM topk WHERE rank <= 10",
    "SELECT query_id, (rank - 5)::BIGINT AS rank, doc_id, n_chars::DOUBLE AS sort_val\nFROM topk WHERE rank BETWEEN 6 AND 10",
)
assert "BETWEEN 6 AND 10" in _SORT_AFTER_SQL

# operator=and: a doc must match EVERY term of its query
_BM25_AND_SQL = _BM25_SQL_TEMPLATE.replace("{_TOK}", _TOK).format(
    having="HAVING count(*) = (SELECT count(*) FROM queries q2 WHERE q2.query_id = q.query_id)"
)

# title tokens := analyzer over the source column (the multi-field index
# maps title := source, body := text)
_TOK_TITLE = _TOK.replace("lower(text)", "lower(source)")

# ES multi_match most_fields: per-field BM25 (own df/idf/dl/avgdl per
# field), per-field score round6'd, the cross-field sum re-round6'd —
# exactly the engine's score contract (engine.multi_match docstring).
# Query derivation mirrored: body terms ranked by (body df desc, term),
# title terms by (title df desc, term); queries = [b1], [b1 t1], [t1],
# [b2 b3].
_MULTI_MATCH_SQL = f"""
WITH fields AS (
  SELECT 'body' AS field, doc_id, {_TOK} AS toks FROM documents
  UNION ALL
  SELECT 'title' AS field, doc_id, {_TOK_TITLE} AS toks FROM documents
),
dl AS (SELECT field, doc_id, len(toks)::DOUBLE AS dl FROM fields),
stats AS (SELECT count(*)::DOUBLE AS n FROM documents),
fstats AS (SELECT field, avg(dl) AS avgdl FROM dl GROUP BY 1),
toks AS (SELECT field, doc_id, unnest(toks) AS term FROM fields),
tf AS (SELECT field, doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2, 3),
df AS (SELECT field, term, count(*)::DOUBLE AS df FROM tf GROUP BY 1, 2),
body_ranked AS (
  SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r
  FROM df WHERE field = 'body'
),
title_ranked AS (
  SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r
  FROM df WHERE field = 'title'
),
queries AS (
  SELECT 0 AS query_id, term FROM body_ranked WHERE r = 1
  UNION ALL SELECT 1, term FROM body_ranked WHERE r = 1
  UNION ALL SELECT 1, term FROM title_ranked WHERE r = 1
  UNION ALL SELECT 2, term FROM title_ranked WHERE r = 1
  UNION ALL SELECT 3, term FROM body_ranked WHERE r IN (2, 3)
),
qterms AS (SELECT DISTINCT query_id, term FROM queries),
fscores AS (
  SELECT q.query_id, tf.field, tf.doc_id,
         round(sum(
           ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / fs.avgdl))
         ), 6) AS fscore
  FROM qterms q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term AND df.field = tf.field
  JOIN dl ON dl.doc_id = tf.doc_id AND dl.field = tf.field
  JOIN fstats fs ON fs.field = tf.field
  CROSS JOIN stats s
  GROUP BY 1, 2, 3
),
scores AS (
  SELECT query_id, doc_id, round(sum(fscore), 6) AS score
  FROM fscores GROUP BY 1, 2
),
topk AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rank
  FROM scores
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM topk WHERE rank <= 10
"""

# multi_match with an ES field boost (title^2): title fscore doubled
# before the cross-field sum, re-round6'd
_MULTI_MATCH_BOOST_SQL = _MULTI_MATCH_SQL.replace(
    "SELECT query_id, doc_id, round(sum(fscore), 6) AS score",
    "SELECT query_id, doc_id, round(sum(fscore *"
    " CASE field WHEN 'title' THEN 2.0 ELSE 1.0 END), 6) AS score",
)
assert "WHEN 'title' THEN 2.0" in _MULTI_MATCH_BOOST_SQL

# ES dis_max over the same fields/query derivation as _MULTI_MATCH_SQL:
# doc score = max(field score) + 0.3 * (sum - max), re-round6'd
_DIS_MAX_SQL = _MULTI_MATCH_SQL.replace(
    "SELECT query_id, doc_id, round(sum(fscore), 6) AS score",
    "SELECT query_id, doc_id,"
    " round(max(fscore) + 0.3 * (sum(fscore) - max(fscore)), 6) AS score",
)
assert "0.3" in _DIS_MAX_SQL  # replace anchor must exist

# ES multi_match type=cross_fields over the same two-field index and
# query derivation: TERM-centric — idf from the blended df (max over
# the fields' dfs, the Lucene BlendedTermQuery convention), per doc per
# term the best field's idf*tf_part, summed over terms, round6 once
_XF_SQL = _MULTI_MATCH_SQL.split("fscores AS (")[0] + """bdf AS (
  SELECT term, ln(1 + (s.n - max(df.df) + 0.5) / (max(df.df) + 0.5)) AS idf
  FROM df CROSS JOIN stats s GROUP BY term, s.n
),
tscores AS (
  SELECT q.query_id, tf.term, tf.doc_id,
         max(round(
           b.idf * tf.tf * 2.2
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / fs.avgdl))
         , 6)) AS m
  FROM qterms q
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id AND dl.field = tf.field
  JOIN fstats fs ON fs.field = tf.field
  JOIN bdf b ON b.term = q.term
  GROUP BY 1, 2, 3
),
scores AS (
  SELECT query_id, doc_id, round(sum(m), 6) AS score
  FROM tscores GROUP BY 1, 2
),
topk AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rank
  FROM scores
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM topk WHERE rank <= 10
"""
assert "bdf" in _XF_SQL and _XF_SQL.count("tscores") == 2

# ES combined_fields (BM25F) over the same two-field index and query
# derivation as _MULTI_MATCH_SQL: tf and dl blended across fields with
# title weight 2.0, idf from the cross-field UNION df, ONE BM25 per term
_CF_SQL = _MULTI_MATCH_SQL.split("qterms AS (")[0] + """qterms AS (SELECT DISTINCT query_id, term FROM queries),
dl_c AS (
  SELECT doc_id,
         sum(CASE field WHEN 'title' THEN 2.0 ELSE 1.0 END * dl) AS dl
  FROM dl GROUP BY 1
),
avg_c AS (SELECT avg(dl) AS avgdl FROM dl_c),
ctf AS (
  SELECT doc_id, term,
         sum(CASE field WHEN 'title' THEN 2.0 ELSE 1.0 END * tf) AS tf
  FROM tf GROUP BY 1, 2
),
dfu AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tf GROUP BY 1),
scores AS (
  SELECT q.query_id, c.doc_id,
         round(sum(
           ln(1 + (s.n - dfu.df + 0.5) / (dfu.df + 0.5))
           * c.tf * 2.2 / (c.tf + 1.2 * (0.25 + 0.75 * d.dl / a.avgdl))
         ), 6) AS score
  FROM qterms q
  JOIN ctf c ON c.term = q.term
  JOIN dfu ON dfu.term = q.term
  JOIN dl_c d ON d.doc_id = c.doc_id
  CROSS JOIN stats s CROSS JOIN avg_c a
  GROUP BY 1, 2
),
topk AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rank
  FROM scores
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM topk WHERE rank <= 10
"""
assert "dfu" in _CF_SQL and "dl_c" in _CF_SQL

# ES match on the mapped title field only: same BM25 shape as _BM25_SQL
# but every stat (tf/df/dl/avgdl) comes from the title (:= source) field;
# n stays the whole corpus.  Derivation: title terms ranked by
# (df desc, term asc); queries = [t1], [t1 t2], [t3], [t2 t4].
_MATCH_TITLE_SQL = """
WITH dl AS (
  SELECT doc_id, len({_TOK_TITLE})::DOUBLE AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
),
toks AS (
  SELECT doc_id, unnest({_TOK_TITLE}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
df AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1
),
ranked_terms AS (
  SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df
),
queries AS (
  SELECT 0 AS query_id, term FROM ranked_terms WHERE r = 1
  UNION ALL SELECT 1, term FROM ranked_terms WHERE r IN (1, 2)
  UNION ALL SELECT 2, term FROM ranked_terms WHERE r = 3
  UNION ALL SELECT 3, term FROM ranked_terms WHERE r IN (2, 4)
),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum(
           ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
         ) AS raw_score
  FROM queries q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
topk AS (
  SELECT query_id, doc_id, round(raw_score, 6) AS score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(raw_score, 6) DESC, doc_id ASC
         ) AS rank
  FROM scores
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM topk WHERE rank <= 10
""".replace("{_TOK_TITLE}", _TOK_TITLE)

# ES bool query: must/should match clauses + minimum_should_match +
# must_not.  Score contract (mirrors engine.score_segment_bool):
# clause score = round6(clause BM25), doc score = round6(sum of matched
# must+should clause scores); a doc must match EVERY must clause, >= msm
# should clauses, and no must_not term.  Derivation: same ranked_terms as
# _BM25_SQL; r-th term by (df desc, term asc).
_BOOL_SQL = """
WITH dl AS (
  SELECT doc_id, len({_TOK})::DOUBLE AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
),
toks AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
df AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1
),
ranked_terms AS (
  SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df
),
clauses AS (
  SELECT v.query_id, v.clause_id, v.role, rt.term
  FROM (VALUES
    (0, 0, 'm', 2), (0, 1, 'm', 3),
    (1, 0, 'm', 2), (1, 1, 's', 5), (1, 2, 's', 7),
    (2, 0, 's', 4), (2, 1, 's', 6),
    (3, 0, 'm', 3), (3, 1, 's', 5), (3, 2, 's', 8), (3, 3, 'n', 1)
  ) AS v(query_id, clause_id, role, r)
  JOIN ranked_terms rt ON rt.r = v.r
),
params AS (
  SELECT * FROM (VALUES (0, 0), (1, 0), (2, 1), (3, 1)) AS p(query_id, msm)
),
cscore AS (
  SELECT c.query_id, c.clause_id, c.role, tf.doc_id,
         round(sum(
           ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
         ), 6) AS cs
  FROM clauses c
  JOIN tf ON tf.term = c.term
  JOIN df ON df.term = c.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  WHERE c.role <> 'n'
  GROUP BY 1, 2, 3, 4
),
nmust AS (
  SELECT query_id, count(DISTINCT clause_id) AS n FROM clauses WHERE role = 'm' GROUP BY 1
),
matched AS (
  SELECT cs.query_id, cs.doc_id,
         count(DISTINCT CASE WHEN cs.role = 'm' THEN cs.clause_id END) AS n_m,
         count(DISTINCT CASE WHEN cs.role = 's' THEN cs.clause_id END) AS n_s,
         sum(cs.cs) AS raw
  FROM cscore cs GROUP BY 1, 2
),
mn AS (
  SELECT DISTINCT c.query_id, tf.doc_id
  FROM clauses c JOIN tf ON tf.term = c.term
  WHERE c.role = 'n'
),
scores AS (
  SELECT m.query_id, m.doc_id, round(m.raw, 6) AS score
  FROM matched m
  JOIN params p ON p.query_id = m.query_id
  WHERE m.n_m = coalesce((SELECT n FROM nmust WHERE nmust.query_id = m.query_id), 0)
    AND m.n_s >= p.msm
    AND NOT EXISTS (
      SELECT 1 FROM mn WHERE mn.query_id = m.query_id AND mn.doc_id = m.doc_id
    )
),
topk AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rank
  FROM scores
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM topk WHERE rank <= 10
""".replace("{_TOK}", _TOK)

# ES simple_query_string: the bool oracle with the parsed clause roles
# (+term = must, -term = must_not, bare = should; msm = 1 iff no must)
_SQS_SQL = _BOOL_SQL.replace(
    """    (0, 0, 'm', 2), (0, 1, 'm', 3),
    (1, 0, 'm', 2), (1, 1, 's', 5), (1, 2, 's', 7),
    (2, 0, 's', 4), (2, 1, 's', 6),
    (3, 0, 'm', 3), (3, 1, 's', 5), (3, 2, 's', 8), (3, 3, 'n', 1)""",
    """    (0, 0, 'm', 2), (0, 1, 's', 4), (0, 2, 's', 5), (0, 3, 'n', 1),
    (1, 0, 's', 3), (1, 1, 's', 5),
    (2, 0, 'm', 1), (2, 1, 'm', 6),
    (3, 0, 's', 7), (3, 1, 's', 8), (3, 2, 'n', 2)""",
).replace(
    "(VALUES (0, 0), (1, 0), (2, 1), (3, 1)) AS p(query_id, msm)",
    "(VALUES (0, 0), (1, 1), (2, 0), (3, 1)) AS p(query_id, msm)",
)
assert "(1, 0, 's', 3)" in _SQS_SQL and "(3, 1)) AS p" in _SQS_SQL


def entry() -> Any:
    """Flagship pipeline on sf0.001: build the inverted index over the
    documents table and return BM25 top-k for the derived query set."""
    from kafka_es_ray.pipelines.fulltext import bm25_topk_documents

    return bm25_topk_documents(SF_SMOKE)


# ---------------------------------------------------------------------------


def _q_bm25_topk(sf_dir: str):
    from kafka_es_ray.pipelines.fulltext import bm25_topk_documents

    return bm25_topk_documents(sf_dir)


def _q_bm25_resident_topk(sf_dir: str):
    """BM25 top-k through the RESIDENT searcher service
    (query/searcher.py): a long-lived scorer pool with shard affinity,
    cached global stats and manifest-fingerprint invalidation — the
    serving path that removes the ~2s per-batch fixed floor.  The batch
    runs TWICE through one session (cold then warm); the WARM result is
    returned and must be row-identical to the per-batch path (same SQL
    oracle as bm25_topk — the determinism contract)."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import (
        DOCS_CFG,
        build_documents_index,
        derive_query_set,
    )
    from kafka_es_ray.query.engine import IndexSearcher
    from kafka_es_ray.query.searcher import SearcherSession

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_residx_")
    try:
        build_documents_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx))
        with SearcherSession(idx, DOCS_CFG) as sess:
            sess.search(queries).to_pandas()  # cold: spawn + stats
            out = sess.search(queries).to_pandas()  # warm: the claim
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_bm25_topk_and(sf_dir: str):
    """match operator=and: docs must contain every query term."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_andidx_")
    try:
        build_documents_index(sf_dir, idx)
        searcher = IndexSearcher(idx)
        queries = derive_query_set(searcher)
        queries = queries[queries["text"] != "zzzabsentterm"]
        res = searcher.search_batch(queries.assign(operator="and"))
        return res[["query_id", "rank", "doc_id", "score"]].reset_index(drop=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _analyzer_documents_index(sf_dir: str, idx: str, lang_value: str):
    """documents index analyzed with a registered custom analyzer chain
    (the lang value selects the analyzer, index- and query-side — the
    ES per-field-analyzer contract)."""
    import pyarrow as pa

    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import DOCS_CFG, documents_dataset

    ds = documents_dataset(sf_dir)

    def set_lang(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("lang")
        return batch.set_column(
            i, "lang", pa.array([lang_value] * len(batch), type=pa.string())
        )

    build_index(
        ds.map_batches(set_lang, batch_format="pyarrow"),
        idx, DOCS_CFG, key_col="key", text_col="text", lang_col="lang",
        html_col=None, ts_col=None, id_col="doc_id",
    )


def _q_analyzer_topk(sf_dir: str, lang_value: str, prefix: str):
    """BM25 top-k under a custom analyzer chain: the whole pipeline
    (ranked-term derivation, 4 derived queries, scoring) runs over the
    FILTERED token stream; the SQL oracle replays the identical filter
    inside its tokenizer expression."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.pipelines.fulltext import derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix=prefix)
    try:
        _analyzer_documents_index(sf_dir, idx, lang_value)
        top = derive_ranked_terms(IndexSearcher(idx), 8)
        qtexts = [
            " ".join(top[0:1]), " ".join(top[1:3]),
            " ".join(top[3:6]), " ".join(top[6:8]),
        ]
        queries = pd.DataFrame(
            {
                "query_id": np.arange(4, dtype=np.int64),
                "text": qtexts,
                "lang": lang_value,
            }
        )
        out = run_queries(queries, idx).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_analyzer_stop_topk(sf_dir: str):
    """ES `stop` token filter (the `_english_` stopword set) as a frozen
    analyzer chain: stopwords never enter the index OR the query plan."""
    return _q_analyzer_topk(sf_dir, "en_stop", "kafka_es_ray_stpidx_")


def _q_analyzer_stem_topk(sf_dir: str):
    """ES `stemmer: minimal_english` (Lucene EnglishMinimalStemmer,
    plural-only) as a frozen analyzer chain, applied index- and
    query-side."""
    return _q_analyzer_topk(sf_dir, "en_min_stem", "kafka_es_ray_stmidx_")


# `_english_` stop filter inside the tokenizer expression
_STOP_LIST_SQL = (
    "'" + "','".join(sorted(
        "a an and are as at be but by for if in into is it no not of on or "
        "such that the their then there these they this to was will "
        "with".split()
    )) + "'"
)
_TOK_STOP = f"list_filter({_TOK}, x -> x NOT IN ({_STOP_LIST_SQL}))"

# Lucene EnglishMinimalStemmer as a CASE expression (kept in lockstep
# with functions/tokenizer.english_minimal_stem)
_STEM_CASE = """CASE
  WHEN len(x) < 3 OR substr(x, len(x), 1) <> 's' THEN x
  WHEN substr(x, len(x) - 1, 1) IN ('u', 's') THEN x
  WHEN substr(x, len(x) - 1, 1) = 'e' AND len(x) > 3
       AND substr(x, len(x) - 2, 1) = 'i'
       AND substr(x, len(x) - 3, 1) NOT IN ('a', 'e')
    THEN substr(x, 1, len(x) - 3) || 'y'
  WHEN substr(x, len(x) - 1, 1) = 'e'
       AND substr(x, len(x) - 2, 1) IN ('i', 'a', 'o', 'u') THEN x
  ELSE substr(x, 1, len(x) - 1)
END"""
_TOK_STEM = f"list_transform({_TOK}, x -> {_STEM_CASE})"

_ANALYZER_STOP_SQL = _BM25_SQL_TEMPLATE.replace("{_TOK}", _TOK_STOP).format(having="")
_ANALYZER_STEM_SQL = _BM25_SQL_TEMPLATE.replace("{_TOK}", _TOK_STEM).format(having="")


def _q_match_fuzzy_topk(sf_dir: str):
    """ES match with fuzziness=1: the probe (top ranked term minus its
    last char — a deterministic typo) expands to its edit-distance-1
    dictionary variants via one GLOBAL dictionary-only pass, then scores
    as the bool-OR of the expanded terms."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_mfzidx_")
    try:
        build_documents_index(sf_dir, idx)
        w1 = derive_ranked_terms(IndexSearcher(idx), 1)[0]
        queries = pd.DataFrame(
            {
                "query_id": np.array([0], dtype=np.int64),
                "text": [w1[:-1]],
                "fuzziness": np.array([1], dtype=np.int64),
            }
        )
        out = run_queries(queries, idx).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_match_fuzzy2_topk(sf_dir: str):
    """ES match with fuzziness=2: the same deterministic probe expands
    to its edit-distance-<=2 dictionary variants (vectorized banded
    Levenshtein over the global dictionary), scored as the bool-OR of
    the expanded terms — a strict superset of the fuzziness=1 set."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_mf2idx_")
    try:
        build_documents_index(sf_dir, idx)
        w1 = derive_ranked_terms(IndexSearcher(idx), 1)[0]
        queries = pd.DataFrame(
            {
                "query_id": np.array([0], dtype=np.int64),
                "text": [w1[:-1]],
                "fuzziness": np.array([2], dtype=np.int64),
            }
        )
        out = run_queries(queries, idx).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


_MATCH_FUZZY2_SQL = _MATCH_FUZZY_SQL.replace(
    "WHERE levenshtein(df.term, probe.p) <= 1",
    "WHERE levenshtein(df.term, probe.p) <= 2",
)
assert "<= 2" in _MATCH_FUZZY2_SQL  # replace anchor must exist


def _q_match_fuzzy_dl_topk(sf_dir: str):
    """ES match with fuzziness=2 and fuzzy_transpositions=true (the ES
    DEFAULT metric — an adjacent swap costs one edit): the probe expands
    against the global dictionary under the unrestricted
    Damerau-Levenshtein distance (vectorized OSA band DP + the exact
    Lowrance-Wagner rim), scored as the bool-OR of the expanded terms.
    DuckDB's damerau_levenshtein replays the same unrestricted metric."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_mfdidx_")
    try:
        build_documents_index(sf_dir, idx)
        w1 = derive_ranked_terms(IndexSearcher(idx), 1)[0]
        # transposed-interior probe: swap the two middle chars so the
        # transposition metric actually diverges from plain Levenshtein
        m = max(1, len(w1) // 2)
        probe = w1[: m - 1] + w1[m] + w1[m - 1] + w1[m + 1 :]
        queries = pd.DataFrame(
            {
                "query_id": np.array([0], dtype=np.int64),
                "text": [probe],
                "fuzziness": np.array([2], dtype=np.int64),
                "fuzzy_transpositions": [True],
            }
        )
        out = run_queries(queries, idx).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


_MATCH_FUZZY_DL_SQL = _MATCH_FUZZY_SQL.replace(
    """probe AS (
  SELECT substr(term, 1, len(term) - 1) AS p FROM ranked_terms WHERE r = 1
),""",
    """probe AS (
  SELECT substr(term, 1, GREATEST(len(term) // 2, 1) - 1)
         || substr(term, GREATEST(len(term) // 2, 1) + 1, 1)
         || substr(term, GREATEST(len(term) // 2, 1), 1)
         || substr(term, GREATEST(len(term) // 2, 1) + 2) AS p
  FROM ranked_terms WHERE r = 1
),""",
).replace(
    "WHERE levenshtein(df.term, probe.p) <= 1",
    "WHERE damerau_levenshtein(df.term, probe.p) <= 2",
)
assert "damerau_levenshtein" in _MATCH_FUZZY_DL_SQL


def _q_weighted_terms_topk(sf_dir: str):
    """ES sparse_vector / rank_features weighted-term retrieval (the
    learned-sparse ELSER/SPLADE scoring shape): score = Σ w_t · tf(t,d)
    over the three df-top-ranked terms with fixed weights."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_wtidx_")
    try:
        build_documents_index(sf_dir, idx)
        w1, w2, w3 = derive_ranked_terms(IndexSearcher(idx), 3)
        queries = pd.DataFrame(
            {
                "query_id": np.array([0], dtype=np.int64),
                "text": [f"{w1}:1.5 {w2}:0.4 {w3}:2.0"],
                "type": ["weighted_terms"],
            }
        )
        out = run_queries(queries, idx).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_terms_lookup_topk(sf_dir: str):
    """ES terms lookup: the terms-filter values are fetched from another
    document (index/id="0", path=lang) via the distributed _mget path,
    then applied as a keyword membership filter on the scored BM25
    queries — two engine APIs composed exactly like the ES rewrite."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_mget, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_tlidx_")
    try:
        build_documents_index(sf_dir, idx)
        looked = run_mget(["0"], idx)
        assert bool(looked["found"].iloc[0])
        lang_val = str(looked["lang"].iloc[0])
        searcher = IndexSearcher(idx)
        queries = derive_query_set(searcher)
        queries = queries[queries["text"] != "zzzabsentterm"].assign(
            kw_field="lang", kw_value=lang_val
        )
        out = run_queries(queries, idx).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_wrapper_topk(sf_dir: str):
    """ES wrapper query: the derived query-1 match wrapped as
    base64(JSON) transport — decoded and rewritten at plan time, scores
    identical to the native match row."""
    import base64
    import json
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_wrapidx_")
    try:
        build_documents_index(sf_dir, idx)
        searcher = IndexSearcher(idx)
        q1 = derive_query_set(searcher)
        text = str(q1[q1["query_id"] == 1]["text"].iloc[0])
        b64 = base64.b64encode(
            json.dumps({"match": {"text": {"query": text}}}).encode("utf-8")
        ).decode("ascii")
        queries = pd.DataFrame(
            {"query_id": np.array([0], dtype=np.int64), "text": [b64],
             "type": ["wrapper"]}
        )
        out = run_queries(queries, idx).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_multi_match(sf_dir: str):
    """ES multi_match most_fields over a TWO-FIELD index (title := source,
    body := text): per-field BM25 (own df/idf/length-norm/avgdl per field)
    summed per doc — distributed run_queries path."""
    from kafka_es_ray.pipelines.fulltext import multi_match_topk_documents

    return multi_match_topk_documents(sf_dir)


def _q_multi_match_boost(sf_dir: str):
    """multi_match most_fields with an ES per-field boost (title^2):
    title's round6'd BM25 doubled before the cross-field sum."""
    from kafka_es_ray.pipelines.fulltext import multi_match_boost_topk_documents

    return multi_match_boost_topk_documents(sf_dir)


def _q_dis_max(sf_dir: str):
    """ES dis_max over the same two-field index and query set as
    multi_match: doc score = best field's BM25 + 0.3 x the other fields
    (ES tie_breaker) — distributed run_queries path."""
    from kafka_es_ray.pipelines.fulltext import dis_max_topk_documents

    return dis_max_topk_documents(sf_dir)


def _q_bool_topk(sf_dir: str):
    """ES bool query (must/should clauses + minimum_should_match +
    must_not) through the distributed run_queries path."""
    from kafka_es_ray.pipelines.fulltext import bool_topk_documents

    return bool_topk_documents(sf_dir)


def _q_match_title(sf_dir: str):
    """ES match on one mapped field (title) — BM25 with the field's own
    df/idf/length-norm/avgdl, distributed run_queries path."""
    from kafka_es_ray.pipelines.fulltext import match_title_topk_documents

    return match_title_topk_documents(sf_dir)


def _q_phrase_topk(sf_dir: str):
    """ES match_phrase analog (positions-indexed build): top-10 BM25
    phrase hits for the corpus's most frequent bigram (deterministic
    derivation mirrored by the SQL oracle: count desc, w1 asc, w2 asc)."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.pipelines.fulltext import build_documents_index
    from kafka_es_ray.pipelines.text_ops import top_bigram
    from kafka_es_ray.query.engine import IndexSearcher
    from kafka_es_ray.sources.parquet import read_table

    # deterministic phrase derivation: most frequent adjacent bigram —
    # fully distributed (per-batch partials -> bucketed combine -> top-1);
    # the driver never materializes doc text (oracle-mirrored rule:
    # count desc, w1 asc, w2 asc)
    w1, w2, _ = top_bigram(read_table(sf_dir, "documents", columns=["text"]))

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_phridx_")
    try:
        cfg = EngineConfig(num_partitions=8, index_positions=True)
        build_documents_index(sf_dir, idx, cfg)
        s = IndexSearcher(idx, cfg)
        res = s.search_phrase(f"{w1} {w2}", k=10)
        return res[["rank", "doc_id", "score"]].reset_index(drop=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_span_near_topk(sf_dir: str):
    """ES span_near (in_order=true, slop=3) over the two df-top-ranked
    terms: docs with an ordered w1..w2 chain of gap <= 3 — distributed
    run_queries span plan; scoring per the engine phrase convention."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_spanidx_")
    try:
        cfg = EngineConfig(num_partitions=8, index_positions=True)
        build_documents_index(sf_dir, idx, cfg)
        w1, w2 = derive_ranked_terms(IndexSearcher(idx, cfg), 2)
        queries = pd.DataFrame(
            {
                "query_id": np.array([0], dtype=np.int64),
                "text": [f"{w1} {w2}"],
                "type": ["span_near"],
                "slop": np.array([3], dtype=np.int64),
            }
        )
        out = run_queries(queries, idx, cfg).to_pandas()
        return (
            out.sort_values("rank")[["rank", "doc_id", "score"]]
            .reset_index(drop=True)
            .astype({"rank": np.int64, "doc_id": np.int64})
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_span_multi_topk(sf_dir: str):
    """ES span_near whose second clause is a span_multi prefix wrapper
    (SpanMultiTermQueryWrapper over a prefix query): slot 1 = the
    df-top-ranked term, slot 2 = ANY dictionary term starting with the
    rank-2 term's first 3 chars; ordered chain with gap <= 3.  The
    prefix expands against the GLOBAL dictionary (deterministic across
    shard layouts); idf_sum sums every present slot member (the span_or
    convention applied per slot)."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_spmidx_")
    try:
        cfg = EngineConfig(num_partitions=8, index_positions=True)
        build_documents_index(sf_dir, idx, cfg)
        w1, w2 = derive_ranked_terms(IndexSearcher(idx, cfg), 2)
        queries = pd.DataFrame(
            {
                "query_id": np.array([0], dtype=np.int64),
                "text": [f"{w1} {w2[:3]}*"],
                "type": ["span_multi"],
                "slop": np.array([3], dtype=np.int64),
            }
        )
        out = run_queries(queries, idx, cfg).to_pandas()
        return (
            out.sort_values("rank")[["rank", "doc_id", "score"]]
            .reset_index(drop=True)
            .astype({"rank": np.int64, "doc_id": np.int64})
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _span_contain_query(sf_dir: str, mode: str):
    """Shared driver for span_containing / span_within: big = span_near
    of the two df-top-ranked terms (slop=3, minimal spans per start),
    little = the rank-3 term; distributed run_queries span_contain plan."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_spcidx_")
    try:
        cfg = EngineConfig(num_partitions=8, index_positions=True)
        build_documents_index(sf_dir, idx, cfg)
        w1, w2, w3 = derive_ranked_terms(IndexSearcher(idx, cfg), 3)
        queries = pd.DataFrame(
            {
                "query_id": np.array([0], dtype=np.int64),
                "text": [f"{w1} {w2}"],
                "little": [w3],
                "type": [mode],
                "slop": np.array([3], dtype=np.int64),
            }
        )
        out = run_queries(queries, idx, cfg).to_pandas()
        return (
            out.sort_values("rank")[["rank", "doc_id", "score"]]
            .reset_index(drop=True)
            .astype({"rank": np.int64, "doc_id": np.int64})
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_span_containing_topk(sf_dir: str):
    """ES span_containing: big w1..w2 span_near spans (slop=3) that
    contain a w3 occurrence; tf = surviving big spans per doc."""
    return _span_contain_query(sf_dir, "span_containing")


def _q_span_within_topk(sf_dir: str):
    """ES span_within: w3 occurrences inside some big w1..w2 span_near
    span (slop=3); tf = surviving w3 occurrences per doc."""
    return _span_contain_query(sf_dir, "span_within")


def _q_intervals_topk(sf_dir: str):
    """ES intervals query (all_of, ordered=false, max_gaps=3) over the
    two df-top-ranked terms: docs with some window holding both terms in
    ANY order with <= 3 gaps — distributed run_queries intervals plan;
    tf = valid minimal-window ends, phrase-convention scoring."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_intervidx_")
    try:
        cfg = EngineConfig(num_partitions=8, index_positions=True)
        build_documents_index(sf_dir, idx, cfg)
        w1, w2 = derive_ranked_terms(IndexSearcher(idx, cfg), 2)
        queries = pd.DataFrame(
            {
                "query_id": np.array([0], dtype=np.int64),
                "text": [f"{w1} {w2}"],
                "type": ["intervals"],
                "max_gaps": np.array([3], dtype=np.int64),
            }
        )
        out = run_queries(queries, idx, cfg).to_pandas()
        return (
            out.sort_values("rank")[["rank", "doc_id", "score"]]
            .reset_index(drop=True)
            .astype({"rank": np.int64, "doc_id": np.int64})
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_span_or_topk(sf_dir: str):
    """ES span_or over the df-rank-3/5 span_term clauses: union of
    occurrences, span freq = Σ clause tfs per doc — postings-only
    kernel, phrase-convention scoring."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_soridx_")
    try:
        cfg = EngineConfig(num_partitions=8, index_positions=True)
        build_documents_index(sf_dir, idx, cfg)
        terms = derive_ranked_terms(IndexSearcher(idx, cfg), 5)
        queries = pd.DataFrame(
            {
                "query_id": np.array([0], dtype=np.int64),
                "text": [f"{terms[2]} {terms[4]}"],
                "type": ["span_or"],
            }
        )
        out = run_queries(queries, idx, cfg).to_pandas()
        return (
            out.sort_values("rank")[["rank", "doc_id", "score"]]
            .reset_index(drop=True)
            .astype({"rank": np.int64, "doc_id": np.int64})
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_span_not_topk(sf_dir: str):
    """ES span_not: df-rank-1 include spans surviving a ±2-token window
    around any df-rank-2 exclude occurrence (Lucene pre/post)."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_snotidx_")
    try:
        cfg = EngineConfig(num_partitions=8, index_positions=True)
        build_documents_index(sf_dir, idx, cfg)
        w1, w2 = derive_ranked_terms(IndexSearcher(idx, cfg), 2)
        queries = pd.DataFrame(
            {
                "query_id": np.array([0], dtype=np.int64),
                "text": [w1],
                "type": ["span_not"],
                "exclude": [w2],
                "pre": np.array([2], dtype=np.int64),
                "post": np.array([2], dtype=np.int64),
            }
        )
        out = run_queries(queries, idx, cfg).to_pandas()
        return (
            out.sort_values("rank")[["rank", "doc_id", "score"]]
            .reset_index(drop=True)
            .astype({"rank": np.int64, "doc_id": np.int64})
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_query_string_topk(sf_dir: str):
    """ES query_string (Lucene syntax subset): '+t3 t6 "b1 b2"' — must
    term + bare should + quoted must-phrase over the df-rank-3/6 terms
    and the corpus's top bigram; rewritten onto the bool path with a
    phrase clause, distributed run_queries."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.pipelines.fulltext import (
        build_documents_index,
        derive_ranked_terms,
    )
    from kafka_es_ray.pipelines.text_ops import top_bigram
    from kafka_es_ray.query.engine import IndexSearcher, run_queries
    from kafka_es_ray.sources.parquet import read_table

    w1, w2, _ = top_bigram(read_table(sf_dir, "documents", columns=["text"]))
    idx = tempfile.mkdtemp(prefix="kafka_es_ray_qsidx_")
    try:
        cfg = EngineConfig(num_partitions=8, index_positions=True)
        build_documents_index(sf_dir, idx, cfg)
        terms = derive_ranked_terms(IndexSearcher(idx, cfg), 6)
        t3, t6 = terms[2], terms[5]
        queries = pd.DataFrame(
            {
                "query_id": np.array([0], dtype=np.int64),
                "text": [f'+{t3} {t6} "{w1} {w2}"'],
                "type": ["query_string"],
            }
        )
        out = run_queries(queries, idx, cfg).to_pandas()
        return (
            out.sort_values("rank")[["rank", "doc_id", "score"]]
            .reset_index(drop=True)
            .astype({"rank": np.int64, "doc_id": np.int64})
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_span_first_topk(sf_dir: str):
    """ES span_first envelope around a span_near chain (slop=3): the
    ordered w1..w2 span must end within the first 8 token positions —
    distributed run_queries span plan with first_end."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_spanfidx_")
    try:
        cfg = EngineConfig(num_partitions=8, index_positions=True)
        build_documents_index(sf_dir, idx, cfg)
        w1, w2 = derive_ranked_terms(IndexSearcher(idx, cfg), 2)
        queries = pd.DataFrame(
            {
                "query_id": np.array([0], dtype=np.int64),
                "text": [f"{w1} {w2}"],
                "type": ["span_near"],
                "slop": np.array([3], dtype=np.int64),
                "first_end": np.array([8], dtype=np.int64),
            }
        )
        out = run_queries(queries, idx, cfg).to_pandas()
        return (
            out.sort_values("rank")[["rank", "doc_id", "score"]]
            .reset_index(drop=True)
            .astype({"rank": np.int64, "doc_id": np.int64})
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_range_filter_topk(sf_dir: str):
    """ES bool query with a numeric range filter (n_chars in [150, 400])
    over the derived BM25 queries — distributed run_queries path over an
    index built with cfg.numeric_cols (num_ docstore columns)."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_rngidx_")
    try:
        cfg = EngineConfig(num_partitions=8, numeric_cols=("n_chars",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("n_chars",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"].assign(
            range_field="n_chars", range_gte=150.0, range_lte=400.0
        )
        out = run_queries(queries, idx, cfg).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_terminate_after_count(sf_dir: str):
    """ES _count with terminate_after (per-shard early-termination cap,
    5 per segment): the index is ROUTING-partitioned on doc_id % 8 (ES
    ?routing=), so partition membership — and therefore the capped
    count — is SQL-replayable (the oracle inlines the fixed
    routing-value -> partition map; round-4 verdict #5 turned this from
    rows-only into a full oracle).  Returns one row per derived query
    with the capped count and the terminated_early flag."""
    import shutil
    import tempfile

    import pyarrow as pa

    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import (
        DOCS_CFG,
        derive_query_set,
        documents_dataset,
    )
    from kafka_es_ray.query.engine import IndexSearcher, run_counts

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_taidx_")
    try:
        ds = documents_dataset(sf_dir)

        def add_routing(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            return batch.append_column(
                "routing", pa.array((ids % 8).astype(str))
            )

        ds = ds.map_batches(add_routing, batch_format="pyarrow")
        build_index(
            ds, idx, DOCS_CFG, key_col="key", lang_col="lang",
            html_col=None, ts_col=None, id_col="doc_id",
            routing_col="routing",
        )
        queries = derive_query_set(IndexSearcher(idx))
        return run_counts(queries, idx, terminate_after=5)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_synonyms_topk(sf_dir: str):
    """ES query-time synonym expansion (synonym filter, expand=true,
    query-side-only — the ES-recommended setup): per-row rule maps pull
    synonyms of analyzed query tokens into the term set, scored as a
    plain OR match with per-term df (documented deviation from Lucene
    SynonymQuery's blended df).  Rules here map ranked corpus terms so
    the SQL oracle can replay the exact expansion: q0 t1→{t4,t5},
    q1 t2→{t6} (t3 untouched), q2 t7→absent term (expands to nothing
    present — scores equal plain [t7])."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_synidx_")
    try:
        build_documents_index(sf_dir, idx)
        t = derive_ranked_terms(IndexSearcher(idx), 7)
        queries = pd.DataFrame(
            {
                "query_id": np.int64([0, 1, 2]),
                "text": [t[0], f"{t[1]} {t[2]}", t[6]],
                "lang": "en",
                "k": np.int32(10),
                "synonyms": [
                    f"{t[0]}={t[3]}|{t[4]}",
                    f"{t[1]}={t[5]}",
                    f"{t[6]}=zzzabsentterm",
                ],
            }
        )
        out = run_queries(queries, idx).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


# queries replay the expansion over ranked_terms: q0 = {r1,r4,r5},
# q1 = {r2,r3,r6}, q2 = {r7} + an absent synonym (drops out of the tf
# join) — scores identical to a plain OR match on the expanded sets
_SYNONYMS_SQL = _BM25_SQL.replace(
    """queries AS (
  SELECT 0 AS query_id, term FROM ranked_terms WHERE r = 1
  UNION ALL SELECT 1, term FROM ranked_terms WHERE r IN (2, 3)
  UNION ALL SELECT 2, term FROM ranked_terms WHERE r IN (4, 5, 6)
  UNION ALL SELECT 3, term FROM ranked_terms WHERE r IN (7, 8)
),""",
    """queries AS (
  SELECT 0 AS query_id, term FROM ranked_terms WHERE r IN (1, 4, 5)
  UNION ALL SELECT 1, term FROM ranked_terms WHERE r IN (2, 3, 6)
  UNION ALL SELECT 2, term FROM ranked_terms WHERE r = 7
),""",
)
assert "r IN (1, 4, 5)" in _SYNONYMS_SQL  # replace anchor must exist


def _q_script_filter_topk(sf_dir: str):
    """ES `script` query in filter context: the whitelisted comparison
    ``sqrt(n_chars) - n_chars / 100 > 12`` over numeric docvalues
    restricts the BM25 match set (no score contribution) — distributed
    run_queries path, post-scoring filter exact under MaxScore pruning."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_scfidx_")
    try:
        cfg = EngineConfig(num_partitions=8, numeric_cols=("n_chars",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("n_chars",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"].assign(
            filter_script="sqrt(n_chars) - n_chars / 100 > 12"
        )
        out = run_queries(queries, idx, cfg).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


_SCRIPT_FILTER_SQL = _RANGE_SQL.replace(
    "  WHERE d.n_chars BETWEEN 150 AND 400\n",
    "  WHERE sqrt(d.n_chars) - d.n_chars / 100 > 12\n",
)
assert "sqrt" in _SCRIPT_FILTER_SQL  # replace anchor must exist


_SEARCH_TEMPLATE = """
{"query": {"bool": {
   "must": [{"match": {"text": "{{q}}"}}],
   "filter": [{"range": {"n_chars": {
       "gte": {{lo}}{{^lo}}0{{/lo}},
       "lte": {{hi}}{{^hi}}1000000{{/hi}}}}}]}},
 "size": {{size}}{{^size}}10{{/size}}}
"""


def _q_render_template(sf_dir: str):
    """ES _render/template: the stored search template rendered against
    three params objects WITHOUT executing (the render-only endpoint) —
    one row per request with the rendered JSON body.  The oracle pins
    the exact strings (render is deterministic), full value-hash."""
    import pandas as pd

    from kafka_es_ray.query.templates import render_template

    params = [
        {"q": "alpha", "lo": 150, "hi": 400, "size": 5},
        {"q": "beta"},
        {"q": "a \"quoted\" term", "lo": 1},
    ]
    return pd.DataFrame(
        {
            "request_id": np.arange(len(params), dtype=np.int64),
            "rendered": [render_template(_SEARCH_TEMPLATE, p) for p in params],
        }
    )


_RENDER_TEMPLATE_SQL = """
SELECT * FROM (VALUES
  (0::BIGINT, '
{"query": {"bool": {
   "must": [{"match": {"text": "alpha"}}],
   "filter": [{"range": {"n_chars": {
       "gte": 150,
       "lte": 400}}}]}},
 "size": 5}
'),
  (1::BIGINT, '
{"query": {"bool": {
   "must": [{"match": {"text": "beta"}}],
   "filter": [{"range": {"n_chars": {
       "gte": 0,
       "lte": 1000000}}}]}},
 "size": 10}
'),
  (2::BIGINT, '
{"query": {"bool": {
   "must": [{"match": {"text": "a \\"quoted\\" term"}}],
   "filter": [{"range": {"n_chars": {
       "gte": 1,
       "lte": 1000000}}}]}},
 "size": 10}
')
) t(request_id, rendered) ORDER BY 1
"""


def _q_highlight_topk(sf_dir: str):
    """ES highlighter: top-10 hits per derived query with the <em>-
    wrapped snippet around the first query-term occurrence (rows-only —
    snippet strings are not SQL-expressible; the snippet contract is
    pinned by pytest goldens and test_distributed_fetch_highlight).
    Requires a store_text build."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_hlidx_")
    try:
        cfg = EngineConfig(num_partitions=8, store_text=True)
        build_index(
            documents_dataset(sf_dir), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        out = run_queries(queries, idx, cfg, highlight=True).to_pandas()
        assert out["highlight"].str.contains("<em>").all()
        return (
            out[["query_id", "rank", "doc_id", "score", "highlight"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_track_total_hits(sf_dir: str):
    """ES track_total_hits=true: top-10 hits per derived query plus the
    EXACT total match count (scored sweep + count sweep, both
    partial-only exchanges, joined driver-side)."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_query_set
    from kafka_es_ray.query.apis import run_search_with_totals
    from kafka_es_ray.query.engine import IndexSearcher

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_tthidx_")
    try:
        build_documents_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx))
        queries = queries[queries["text"] != "zzzabsentterm"]
        out = run_search_with_totals(queries, idx)
        return (
            out[["query_id", "rank", "doc_id", "score", "total_hits"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


_TRACK_TOTALS_SQL = _BM25_SQL.replace(
    "SELECT query_id, rank::BIGINT AS rank, doc_id, score\nFROM topk",
    """SELECT t.query_id, t.rank::BIGINT AS rank, t.doc_id, t.score,
       tot.total_hits
FROM topk t JOIN (
  SELECT query_id, count(*)::BIGINT AS total_hits FROM scores GROUP BY 1
) tot USING (query_id)""",
)
assert "total_hits" in _TRACK_TOTALS_SQL  # replace anchor must exist


def _q_msearch_template_topk(sf_dir: str):
    """ES _msearch/template: a batch of independent (template, params)
    pairs — two different template sources across the derived queries —
    rendered and executed as ONE distributed run_queries batch.  Scores
    equal the per-query plain/range-filtered searches, which is what the
    shared oracle asserts."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher
    from kafka_es_ray.query.templates import run_msearch_template

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_mstidx_")
    try:
        cfg = EngineConfig(num_partitions=8, numeric_cols=("n_chars",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("n_chars",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"].reset_index(drop=True)
        plain = '{"query": {"match": {"text": "{{q}}"}}, "size": 10}'
        entries = [
            {"source": _SEARCH_TEMPLATE, "params": {"q": t, "lo": 150, "hi": 400}}
            if i == 0
            else {"source": plain, "params": {"q": t}}
            for i, t in enumerate(queries["text"])
        ]
        out = run_msearch_template(entries, idx, cfg).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_search_template_topk(sf_dir: str):
    """ES search template (_search/template): one stored mustache
    template (match + range filter + size, with {{^var}} default
    values), rendered per params object and executed as ONE distributed
    run_queries batch — query 0 passes lo=150/hi=400, the rest take the
    open-range defaults, so the rendered plans differ per query."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher
    from kafka_es_ray.query.templates import run_search_template

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_tmplidx_")
    try:
        cfg = EngineConfig(num_partitions=8, numeric_cols=("n_chars",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("n_chars",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"].reset_index(drop=True)
        params = [
            {"q": t} if i else {"q": t, "lo": 150, "hi": 400}
            for i, t in enumerate(queries["text"])
        ]
        out = run_search_template(_SEARCH_TEMPLATE, params, idx, cfg).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


# search template: per-query range bounds — query 0 rendered with
# lo=150/hi=400, queries 1-3 with the template's {{^var}} defaults
_SEARCH_TEMPLATE_SQL = _BM25_SQL.replace(
    "  FROM scores\n)",
    "  FROM scores JOIN documents d USING (doc_id)\n"
    "  JOIN (VALUES (0, 150, 400), (1, 0, 1000000), (2, 0, 1000000),\n"
    "        (3, 0, 1000000)) b(query_id, lo, hi) USING (query_id)\n"
    "  WHERE d.n_chars BETWEEN b.lo AND b.hi\n)",
)
assert "BETWEEN b.lo" in _SEARCH_TEMPLATE_SQL  # replace anchor must exist


def _q_knn_topk(sf_dir: str, min_similarity: float | None = None):
    """ES kNN search over a dense_vector mapped field: the documents
    index is built with the embeddings-table vector attached (broadcast
    join on doc_id = vec_id; docs without a vector are never hits), then
    queried with embeddings 0..2 through the exact segment-parallel
    run_knn path."""
    import shutil
    import tempfile

    import pandas as pd
    import ray

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import documents_dataset
    from kafka_es_ray.query.engine import run_knn

    emb = pd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    # small side broadcast ONCE (ray.put), looked up inside map_batches
    emb_ref = ray.put(
        {int(i): np.asarray(v, dtype=np.float32) for i, v in
         zip(emb["vec_id"], emb["embedding"])}
    )

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(emb_ref)
        batch["emb"] = [
            m[d].tolist() if d in m else None for d in batch["doc_id"]
        ]
        return batch

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_knnidx_")
    try:
        cfg = EngineConfig(num_partitions=8, vector_cols=("emb",))
        ds = documents_dataset(sf_dir).map_batches(attach, batch_format="pandas")
        build_index(
            ds, idx, cfg, key_col="key", lang_col="lang", html_col=None,
            ts_col=None, id_col="doc_id",
        )
        queries = pd.DataFrame(
            {
                "query_id": np.int64([0, 1, 2]),
                "vec": [
                    np.asarray(emb["embedding"][i], dtype=np.float32).tolist()
                    for i in range(3)
                ],
                "k": np.int32(10),
            }
        )
        out = run_knn(
            queries, idx, "emb", cfg, min_similarity=min_similarity
        ).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_knn_similarity_topk(sf_dir: str):
    """ES kNN with the `similarity` threshold: exact cosine top-10 but
    hits under 0.3 similarity are dropped (queries may return fewer
    than k — the ES radius-style cutoff)."""
    return _q_knn_topk(sf_dir, min_similarity=0.3)


def _q_knn_filtered_topk(sf_dir: str):
    """ES kNN search with a `filter` clause (PRE-filter: the top-k is
    computed among matching docs only, the ES knn-filter contract —
    reference search path delegates to ES `knn.filter`): documents index
    built with the embeddings vector attached and `lang` as a keyword
    field; queries 0..2 each restrict to a different lang value."""
    import shutil
    import tempfile

    import pandas as pd
    import ray

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import documents_dataset
    from kafka_es_ray.query.engine import run_knn

    emb = pd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    emb_ref = ray.put(
        {int(i): np.asarray(v, dtype=np.float32) for i, v in
         zip(emb["vec_id"], emb["embedding"])}
    )

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(emb_ref)
        batch["emb"] = [
            m[d].tolist() if d in m else None for d in batch["doc_id"]
        ]
        return batch

    langs = sorted(
        pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
        ["lang"].unique()
    )[:3]
    idx = tempfile.mkdtemp(prefix="kafka_es_ray_knnfidx_")
    try:
        cfg = EngineConfig(
            num_partitions=8, vector_cols=("emb",), keyword_cols=("lang",)
        )
        ds = documents_dataset(sf_dir).map_batches(attach, batch_format="pandas")
        build_index(
            ds, idx, cfg, key_col="key", lang_col="lang", html_col=None,
            ts_col=None, id_col="doc_id",
        )
        queries = pd.DataFrame(
            {
                "query_id": np.arange(len(langs), dtype=np.int64),
                "vec": [
                    np.asarray(emb["embedding"][i], dtype=np.float32).tolist()
                    for i in range(len(langs))
                ],
                "k": np.int32(10),
                "kw_field": "lang",
                "kw_value": langs,
            }
        )
        out = run_knn(queries, idx, "emb", cfg).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


# ES kNN with a pre-filter: per-query lang restriction (query_id i ->
# i-th distinct lang), exact cosine among matching vectored docs only
_KNN_FILTERED_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id IN (0, 1, 2)
),
flt AS (
  SELECT lang, row_number() OVER (ORDER BY lang) - 1 AS query_id
  FROM (SELECT DISTINCT lang FROM documents)
  QUALIFY query_id < 3
),
v AS (
  SELECT d.doc_id, d.lang, CAST(e.embedding AS DOUBLE[]) AS ev
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
),
sims AS (
  SELECT f.query_id, v.doc_id,
         round(list_cosine_similarity(q.qv, v.ev), 6) AS score
  FROM flt f JOIN q USING (query_id) JOIN v ON v.lang = f.lang
),
topk AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rank
  FROM sims
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM topk WHERE rank <= 10 ORDER BY 1, 2
"""


def _q_rrf_hybrid_topk(sf_dir: str, _tree: bool = False):
    """ES hybrid search (RRF retriever): BM25 over the derived queries
    0-2 + exact kNN over embeddings 0-2, both to depth 20, fused as
    round6(sum 1/(60 + rank)) — the documents index carries the
    embeddings-table vector (broadcast join on doc_id = vec_id)."""
    import shutil
    import tempfile

    import pandas as pd
    import ray

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_rrf

    emb = pd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    emb_ref = ray.put(
        {int(i): np.asarray(v, dtype=np.float32) for i, v in
         zip(emb["vec_id"], emb["embedding"])}
    )

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(emb_ref)
        batch["emb"] = [
            m[d].tolist() if d in m else None for d in batch["doc_id"]
        ]
        return batch

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_rrfidx_")
    try:
        cfg = EngineConfig(num_partitions=8, vector_cols=("emb",))
        ds = documents_dataset(sf_dir).map_batches(attach, batch_format="pandas")
        build_index(
            ds, idx, cfg, key_col="key", lang_col="lang", html_col=None,
            ts_col=None, id_col="doc_id",
        )
        texts = derive_query_set(IndexSearcher(idx, cfg))
        queries = pd.DataFrame(
            {
                "query_id": np.int64([0, 1, 2]),
                "text": texts["text"].tolist()[:3],
                "vec": [
                    np.asarray(emb["embedding"][i], dtype=np.float32).tolist()
                    for i in range(3)
                ],
                "k": np.int32(10),
            }
        )
        if _tree:
            # same plan expressed as the nested retriever-tree spec —
            # rank-identical to run_rrf (pytest equivalence), so it
            # shares the rrf SQL oracle
            from kafka_es_ray.query.engine import run_retriever

            spec = {
                "rrf": {
                    "retrievers": [{"standard": {}}, {"knn": {"field": "emb"}}],
                    "rank_window_size": 20,
                    "rank_constant": 60,
                }
            }
            out = run_retriever(queries, idx, spec, cfg)
        else:
            out = run_rrf(queries, idx, "emb", cfg, rank_window=20, rank_constant=60)
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_retriever_tree_topk(sf_dir: str):
    """ES retriever TREE (the modern nested ``retriever`` search body):
    run_retriever evaluating rrf over [standard, knn] — the same plan as
    rrf_hybrid_topk via the generic N-ary tree evaluator."""
    return _q_rrf_hybrid_topk(sf_dir, _tree=True)


def _q_linear_hybrid_topk(sf_dir: str):
    """ES hybrid search (`linear` retriever, minmax normalizer): the
    same BM25 + kNN retriever pair as rrf_hybrid_topk to depth 20, fused
    as round6(2·minmax(bm25) + 1·minmax(cosine)) per query — weighted
    score-based fusion vs RRF's rank-based."""
    import shutil
    import tempfile

    import pandas as pd
    import ray

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_linear

    emb = pd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    emb_ref = ray.put(
        {int(i): np.asarray(v, dtype=np.float32) for i, v in
         zip(emb["vec_id"], emb["embedding"])}
    )

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(emb_ref)
        batch["emb"] = [
            m[d].tolist() if d in m else None for d in batch["doc_id"]
        ]
        return batch

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_linidx_")
    try:
        cfg = EngineConfig(num_partitions=8, vector_cols=("emb",))
        ds = documents_dataset(sf_dir).map_batches(attach, batch_format="pandas")
        build_index(
            ds, idx, cfg, key_col="key", lang_col="lang", html_col=None,
            ts_col=None, id_col="doc_id",
        )
        texts = derive_query_set(IndexSearcher(idx, cfg))
        queries = pd.DataFrame(
            {
                "query_id": np.int64([0, 1, 2]),
                "text": texts["text"].tolist()[:3],
                "vec": [
                    np.asarray(emb["embedding"][i], dtype=np.float32).tolist()
                    for i in range(3)
                ],
                "k": np.int32(10),
            }
        )
        out = run_linear(
            queries, idx, "emb", cfg, rank_window=20, weights=(2.0, 1.0),
            normalizer="minmax",
        )
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_rescore_topk(sf_dir: str):
    """ES rescore: a match query on the corpus's top bigram's words,
    rescored by the exact-phrase BM25 with query_weight=1 /
    rescore_weight=2 and a window covering every hit — phrase-matching
    docs float above equal-base-score docs."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.pipelines.fulltext import build_documents_index
    from kafka_es_ray.pipelines.text_ops import top_bigram
    from kafka_es_ray.query.engine import run_queries
    from kafka_es_ray.sources.parquet import read_table

    w1, w2, _ = top_bigram(read_table(sf_dir, "documents", columns=["text"]))
    idx = tempfile.mkdtemp(prefix="kafka_es_ray_rescidx_")
    try:
        cfg = EngineConfig(num_partitions=8, index_positions=True)
        build_documents_index(sf_dir, idx, cfg)
        q = pd.DataFrame(
            {
                "query_id": np.int64([0]),
                "text": [f"{w1} {w2}"],
                "rescore_phrase": [f"{w1} {w2}"],
                "rescore_window": [10_000_000],
                "query_weight": [1.0],
                "rescore_weight": [2.0],
                "k": np.int32(10),
            }
        )
        out = run_queries(q, idx, cfg).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_fetch_fields_topk(sf_dir: str):
    """ES fields/docvalue_fields retrieval: the derived BM25 top-k with
    the source (keyword) and n_chars (numeric) docstore columns fetched
    per hit — candidates only, never the match set."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_ffidx_")
    try:
        cfg = EngineConfig(
            num_partitions=8, keyword_cols=("source",), numeric_cols=("n_chars",)
        )
        build_index(
            documents_dataset(sf_dir, extra_cols=("source", "n_chars")), idx,
            cfg, key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        out = run_queries(
            queries, idx, cfg, fetch_fields=["source", "n_chars"]
        ).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score", "source", "n_chars"]]
            .astype({"n_chars": np.float64})
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_script_fields_topk(sf_dir: str):
    """ES script_fields / runtime fields: the BM25 top-k with a COMPUTED
    per-hit column — boosted = round6(ln1p(n_chars) * 2) evaluated
    vectorized per candidate via the whitelisted expression subset."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_sfidx_")
    try:
        cfg = EngineConfig(num_partitions=8, numeric_cols=("n_chars",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("n_chars",)), idx,
            cfg, key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        out = run_queries(
            queries, idx, cfg,
            fetch_fields=["n_chars", "boosted=ln1p(n_chars) * 2"],
        ).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score", "n_chars", "boosted"]]
            .astype({"n_chars": np.float64})
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


# ES script_fields: per-hit computed column boosted = round6(ln(1 +
# n_chars) * 2) alongside the plain n_chars docvalue
_SCRIPT_FIELDS_SQL = _BM25_SQL.replace(
    "SELECT query_id, rank::BIGINT AS rank, doc_id, score\nFROM topk WHERE rank <= 10",
    "SELECT t.query_id, t.rank::BIGINT AS rank, t.doc_id, t.score,\n"
    "       d.n_chars::DOUBLE AS n_chars,\n"
    "       round(ln(1 + d.n_chars) * 2, 6) AS boosted\n"
    "FROM topk t JOIN documents d USING (doc_id) WHERE t.rank <= 10",
)
assert "boosted" in _SCRIPT_FIELDS_SQL


def _q_min_score_topk(sf_dir: str):
    """ES min_score: re-run each derived query with a floor equal to its
    own 5th-ranked score from a first pass — hits below the floor are
    dropped per shard before the merge, ranks unchanged."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_msidx_")
    try:
        build_documents_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx))
        queries = queries[queries["text"] != "zzzabsentterm"]
        first = run_queries(queries, idx).to_pandas()
        floors = (
            first[first["rank"] == 5]
            .set_index("query_id")["score"]
            .rename("min_score")
        )
        queries = queries.join(floors, on="query_id", how="inner")
        out = run_queries(queries, idx).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_ids_query(sf_dir: str):
    """ES ids query: fetch docs 10/20/30/40 (+ one absent id) by _id
    through the distributed run_queries path — constant score 1.0,
    ranks by doc_id."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.pipelines.fulltext import build_documents_index
    from kafka_es_ray.query.engine import run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_idsidx_")
    try:
        build_documents_index(sf_dir, idx)
        q = pd.DataFrame(
            {
                "query_id": np.int64([0]),
                "type": "ids",
                "text": ["10|20|30|40|99999999"],
                "k": np.int32(10),
            }
        )
        out = run_queries(q, idx).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_prefix_score_topk(sf_dir: str):
    """ES constant_score over a prefix filter: top-10 hits (all tied at
    boost 2.0, doc_id asc) for the top-4 ranked terms' 3-char prefixes —
    the filter-context rewrite of a multi-term expansion query."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_psidx_")
    try:
        build_documents_index(sf_dir, idx)
        t = derive_ranked_terms(IndexSearcher(idx), 4)
        q = pd.DataFrame(
            {
                "query_id": np.arange(4, dtype=np.int64),
                "type": "constant_score",
                "text": [None] * 4,
                "prefix": [w[:3] for w in t],
                "boost": [2.0] * 4,
                "k": np.int32(10),
            }
        )
        out = run_queries(q, idx).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_random_score_topk(sf_dir: str):
    """ES function_score random_score (seed=42): reproducible
    pseudo-random ranking of each derived query's match set — the
    deterministic corpus-sampling path through the query engine."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_rsidx_")
    try:
        build_documents_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx))
        queries = queries[queries["text"] != "zzzabsentterm"].assign(
            type="random_score", seed="42"
        )
        out = run_queries(queries, idx).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_combined_fields(sf_dir: str):
    """ES combined_fields (BM25F) over the title/body index: the same
    derived query set as multi_match, scored as ONE blended field
    (title weight 2.0) — distributed union-df stats pass + per-shard
    blended scoring."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.pipelines.fulltext import (
        MF_CFG,
        _ranked_field_terms,
        build_documents_mf_index,
    )
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_cfidx_")
    try:
        build_documents_mf_index(sf_dir, idx)
        searcher = IndexSearcher(idx, MF_CFG)
        b1, b2, b3 = _ranked_field_terms(searcher, "body", 3)
        (t1,) = _ranked_field_terms(searcher, "title", 1)
        queries = pd.DataFrame(
            {
                "query_id": np.arange(4, dtype=np.int64),
                "text": [b1, f"{b1} {t1}", t1, f"{b2} {b3}"],
                "type": "combined_fields",
                "fields": "title^2,body",
                "k": np.int32(10),
            }
        )
        out = run_queries(queries, idx, MF_CFG).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_index_prefixes_count(sf_dir: str):
    """ES index_prefixes (search_as_you_type): edge n-grams (2..5 chars)
    of the analyzed tokens indexed as a mapped subfield `px`, so an
    in-range prefix count is ONE exact dictionary lookup per segment —
    counts for the top body term's 2/3/4-char prefixes."""
    import shutil
    import tempfile

    import pandas as pd
    import pyarrow as pa

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import (
        _ranked_field_terms,
        add_index_prefixes,
        documents_dataset,
    )
    from kafka_es_ray.query.engine import IndexSearcher, run_counts

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_pxidx_")
    try:
        cfg = EngineConfig(num_partitions=8, text_fields=("body", "px"))
        ds = add_index_prefixes(
            documents_dataset(sf_dir), text_col="text", out_col="px",
            min_chars=2, max_chars=5,
        )

        def shape(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "key": batch.column("key"),
                    "body": batch.column("text"),
                    "px": batch.column("px"),
                    "lang": batch.column("lang"),
                }
            )

        build_index(
            ds.map_batches(shape, batch_format="pyarrow"), idx, cfg,
            key_col="key", text_col="body", lang_col="lang",
            html_col=None, ts_col=None, id_col="doc_id",
        )
        (t1,) = _ranked_field_terms(IndexSearcher(idx, cfg), "body", 1)
        queries = pd.DataFrame(
            {
                "query_id": np.arange(3, dtype=np.int64),
                "text": [t1[:2], t1[:3], t1[:4]],
                "field": "px",
            }
        )
        out = run_counts(queries, idx, cfg)
        return out.sort_values("query_id").reset_index(drop=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


_INDEX_PREFIXES_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
tf AS (SELECT DISTINCT doc_id, term FROM toks),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
ranked_terms AS (
  SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df
),
t1 AS (SELECT term FROM ranked_terms WHERE r = 1),
probes AS (
  SELECT 0 AS query_id, substr(term, 1, 2) AS p FROM t1
  UNION ALL SELECT 1, substr(term, 1, 3) FROM t1
  UNION ALL SELECT 2, substr(term, 1, 4) FROM t1
)
SELECT p.query_id::BIGINT AS query_id,
       count(DISTINCT tf.doc_id)::BIGINT AS n_matching
FROM probes p LEFT JOIN tf ON tf.term LIKE p.p || '%'
GROUP BY 1 ORDER BY 1
"""


def _q_cross_fields(sf_dir: str):
    """ES multi_match type=cross_fields over the title/body index: the
    multi_match query derivation scored term-centrically — blended idf
    (max per-field df) x the best field's tf-part per doc per term."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.pipelines.fulltext import (
        MF_CFG,
        _ranked_field_terms,
        build_documents_mf_index,
    )
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_xfidx_")
    try:
        build_documents_mf_index(sf_dir, idx)
        searcher = IndexSearcher(idx, MF_CFG)
        b1, b2, b3 = _ranked_field_terms(searcher, "body", 3)
        (t1,) = _ranked_field_terms(searcher, "title", 1)
        queries = pd.DataFrame(
            {
                "query_id": np.arange(4, dtype=np.int64),
                "text": [b1, f"{b1} {t1}", t1, f"{b2} {b3}"],
                "type": "cross_fields",
                "fields": "title,body",
                "k": np.int32(10),
            }
        )
        out = run_queries(queries, idx, MF_CFG).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_kw_filter_topk(sf_dir: str):
    """ES bool query with a keyword term filter (source == the corpus's
    modal source value) over the derived BM25 queries — distributed
    run_queries path over an index built with cfg.keyword_cols."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_kwfidx_")
    try:
        cfg = EngineConfig(num_partitions=8, keyword_cols=("source",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("source",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        vc = (
            pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
            ["source"].value_counts()
        )
        modal = sorted(vc.index[vc == vc.max()])[0]
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"].assign(
            kw_field="source", kw_value=modal
        )
        out = run_queries(queries, idx, cfg).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_sort_search_after(sf_dir: str):
    """ES sort + search_after: page 2 (global sort ranks 6-10) of each
    derived query's n_chars-desc ranking, fetched with the (sort_val,
    doc_id) cursor of page 1's last hit — both pages distributed."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_sorted

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_srtsa_")
    try:
        cfg = EngineConfig(num_partitions=8, numeric_cols=("n_chars",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("n_chars",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        out = []
        # cursors differ per query, so page 2 runs one query at a time —
        # the per-page work is still fully distributed
        for row in queries.itertuples(index=False):
            q1 = pd.DataFrame({"query_id": np.int64([row.query_id]), "text": [row.text]})
            p1 = run_sorted(q1, idx, "n_chars", k=5, cfg=cfg).to_pandas()
            if not len(p1):
                continue
            last = p1.sort_values("rank").iloc[-1]
            p2 = run_sorted(
                q1, idx, "n_chars", k=5, cfg=cfg,
                search_after=(float(last["sort_val"]), int(last["doc_id"])),
            ).to_pandas()
            if len(p2):
                out.append(p2)
        res = pd.concat(out, ignore_index=True)
        return (
            res[["query_id", "rank", "doc_id", "sort_val"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_sort_by_field(sf_dir: str):
    """ES sort-by-field: each derived query's match set ranked by the
    n_chars numeric field desc (ties doc_id asc) — distributed
    SortTopkStage path (per-segment partial top-k, bucketed merge)."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_sorted

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_srtidx_")
    try:
        cfg = EngineConfig(num_partitions=8, numeric_cols=("n_chars",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("n_chars",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        out = run_sorted(queries, idx, "n_chars", k=10, cfg=cfg).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "sort_val"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_runtime_sort_topk(sf_dir: str):
    """ES runtime-field sort (runtime_mappings): each derived query's
    match set ranked by the script-derived value n_chars*3 - n_tokens*7
    (whitelisted painless-expression subset evaluated vectorized
    in-shard), ties doc_id asc — the distributed SortTopkStage path with
    a {"script": ...} virtual field."""
    import shutil

    from kafka_es_ray.query.engine import run_sorted

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts", "n_chars", "n_tokens"), derived=True
    )
    try:
        out = run_sorted(
            queries, idx, "score=n_chars * 3 - n_tokens * 7", k=10, cfg=cfg
        ).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "sort_val"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_search_after_topk(sf_dir: str):
    """ES search_after deep pagination: page 2 (global ranks 11-20) of
    each derived query, fetched with the (score, doc_id) cursor of page
    1's last hit — both pages via the distributed run_queries path;
    returned ranks restart at 1 (ES semantics)."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_saidx_")
    try:
        build_documents_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx))
        queries = queries[queries["text"] != "zzzabsentterm"].reset_index(drop=True)
        p1 = run_queries(queries, idx).to_pandas()
        last = p1[p1["rank"] == 10].set_index("query_id")
        q2 = queries.assign(
            after_score=queries["query_id"].map(last["score"]),
            after_doc=queries["query_id"].map(last["doc_id"]),
        )
        out = run_queries(q2, idx).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)



# ES _terms_enum: first 10 dictionary terms with prefix 's' + global df
_TERMS_ENUM_SQL = """
WITH toks AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
tf AS (SELECT DISTINCT doc_id, term FROM toks)
SELECT term, count(*)::BIGINT AS df FROM tf
WHERE term LIKE 's%'
GROUP BY 1 ORDER BY 1 LIMIT 10
""".replace("{_TOK}", _TOK)

def _q_terms_enum(sf_dir: str):
    """ES _terms_enum API: the first 10 index terms starting with 's'
    plus their global df — dictionary-only, segment-parallel, per-shard
    candidate lists cut to size before the tiny exchange."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import build_documents_index
    from kafka_es_ray.query.engine import run_terms_enum

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_tenumidx_")
    try:
        build_documents_index(sf_dir, idx)
        return run_terms_enum(idx, "s", size=10)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_prefix_count(sf_dir: str):
    """ES prefix query counts: docs containing any term starting with
    the 3-char prefixes of the top-4 ranked terms — sorted-dictionary
    range expansion, distributed MatchSetStage path."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_counts

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_pfxidx_")
    try:
        build_documents_index(sf_dir, idx)
        top = derive_ranked_terms(IndexSearcher(idx), 4)
        queries = pd.DataFrame(
            {
                "query_id": np.arange(len(top), dtype=np.int64),
                "prefix": [t[:3] for t in top],
            }
        )
        out = run_counts(queries, idx)
        return out[out["n_matching"] > 0].reset_index(drop=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_wildcard_count(sf_dir: str):
    """ES wildcard query counts: pre*suf patterns (first 2 + last 1 chars
    of the top-4 ranked terms) — prefix-pruned dictionary expansion +
    vectorized suffix check, distributed MatchSetStage path."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_counts

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_wcidx_")
    try:
        build_documents_index(sf_dir, idx)
        top = derive_ranked_terms(IndexSearcher(idx), 4)
        queries = pd.DataFrame(
            {
                "query_id": np.arange(len(top), dtype=np.int64),
                "wildcard": [f"{t[:2]}*{t[-1]}" for t in top],
            }
        )
        out = run_counts(queries, idx)
        return out[out["n_matching"] > 0].reset_index(drop=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_regexp_count(sf_dir: str):
    """ES regexp query counts: anchored RE2 patterns
    `{first2}[a-z0-9]*{last1}` over the top-4 ranked terms — literal-
    prefix-pruned dictionary expansion, one vectorized RE2 kernel per
    segment, distributed MatchSetStage path.  DuckDB's regexp_full_match
    is the same RE2 engine, so the oracle shares exact semantics."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_counts

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_rexidx_")
    try:
        build_documents_index(sf_dir, idx)
        top = derive_ranked_terms(IndexSearcher(idx), 4)
        queries = pd.DataFrame(
            {
                "query_id": np.arange(len(top), dtype=np.int64),
                "regexp": [f"{t[:2]}[a-z0-9]*{t[-1]}" for t in top],
            }
        )
        out = run_counts(queries, idx)
        return out[out["n_matching"] > 0].reset_index(drop=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_exists_count(sf_dir: str):
    """ES exists query: count docs whose mapped numeric field has a
    value.  Missingness injected deterministically at index time
    (n_chars nulled where doc_id % 7 == 0) so the count is non-trivial;
    the oracle mirrors the same rule."""
    import shutil
    import tempfile

    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import documents_dataset
    from kafka_es_ray.query.engine import run_counts

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_exidx_")
    try:
        cfg = EngineConfig(num_partitions=8, numeric_cols=("n_chars",))

        def blank(b: pa.Table) -> pa.Table:
            miss = pc.equal(
                pa.array(b.column("doc_id").to_numpy() % 7), pa.scalar(0)
            )
            nulled = pc.if_else(miss, pa.scalar(None, pa.int64()), b.column("n_chars"))
            return b.set_column(b.schema.get_field_index("n_chars"), "n_chars", nulled)

        ds = documents_dataset(sf_dir, extra_cols=("n_chars",)).map_batches(
            blank, batch_format="pyarrow"
        )
        build_index(
            ds, idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = pd.DataFrame({"query_id": [0], "exists": ["n_chars"]})
        return run_counts(queries, idx, cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_term_suggest(sf_dir: str):
    """ES term suggester (did-you-mean): probes = top-4 ranked terms with
    the last char dropped; suggestions = distance<=1 dictionary terms
    ranked by global df (freq desc, term asc), probe excluded —
    segment-parallel expansion partials summed to global df."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_term_suggest

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_sugidx_")
    try:
        build_documents_index(sf_dir, idx)
        top = derive_ranked_terms(IndexSearcher(idx), 4)
        probes = [t[:-1] for t in top if len(t) >= 2]
        return run_term_suggest(probes, idx, k=5)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_term_suggest_popular(sf_dir: str):
    """ES term suggester suggest_mode=popular: only candidates whose
    global df strictly exceeds the probe's own df survive (the ES
    higher-frequency rule); probes = the same derived typos PLUS one
    undamaged real term (whose suggestions must all beat its own df)."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_term_suggest

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_sgpidx_")
    try:
        build_documents_index(sf_dir, idx)
        top = derive_ranked_terms(IndexSearcher(idx), 4)
        probes = [t[:-1] for t in top if len(t) >= 2] + [top[3]]
        return run_term_suggest(probes, idx, k=5, suggest_mode="popular")
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_phrase_suggest(sf_dir: str):
    """ES phrase suggester (whole-input did-you-mean): input = the top-2
    ranked terms each with the last char dropped; per-slot direct
    generator (distance<=1, top-5 by df) + unigram LM scoring of the
    slot cross-product, unchanged input excluded."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_phrase_suggest

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_psugidx_")
    try:
        build_documents_index(sf_dir, idx)
        t1, t2 = derive_ranked_terms(IndexSearcher(idx), 2)
        text = f"{t1[:-1]} {t2[:-1]}"
        return run_phrase_suggest([text], idx, k=3, gen_size=5)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_completion_suggest(sf_dir: str):
    """ES completion suggester (autocomplete): prefixes = first 2 chars
    of the top-4 ranked terms; completions = dictionary terms in the
    prefix range ranked by global df (freq desc, term asc)."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_completion_suggest

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_compidx_")
    try:
        build_documents_index(sf_dir, idx)
        top = derive_ranked_terms(IndexSearcher(idx), 4)
        return run_completion_suggest([t[:2] for t in top], idx, k=5)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_fuzzy_count(sf_dir: str):
    """ES fuzzy query counts (fuzziness=1): probes are the top-4 ranked
    terms with their last char deleted (a deterministic typo) — edit-
    distance-1 dictionary expansion, distributed MatchSetStage path."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_counts

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_fzidx_")
    try:
        build_documents_index(sf_dir, idx)
        top = [t for t in derive_ranked_terms(IndexSearcher(idx), 4) if len(t) >= 2]
        queries = pd.DataFrame(
            {
                "query_id": np.arange(len(top), dtype=np.int64),
                "fuzzy": [t[:-1] for t in top],
            }
        )
        out = run_counts(queries, idx)
        return out[out["n_matching"] > 0].reset_index(drop=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_match_stats_agg(sf_dir: str):
    """ES stats aggregation (count/min/max/sum/avg of n_chars) over each
    derived query's match set — distributed NumericAggStage path."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_agg_stats

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_stsidx_")
    try:
        cfg = EngineConfig(num_partitions=8, numeric_cols=("n_chars",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("n_chars",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_agg_stats(queries, idx, "n_chars", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_match_percentiles(sf_dir: str):
    """ES percentiles aggregation (exact, nearest-rank) of n_chars over
    each derived query's match set — per-value count partials through the
    distributed NumericAggStage path."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_agg_percentiles

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_pctidx_")
    try:
        cfg = EngineConfig(num_partitions=8, numeric_cols=("n_chars",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("n_chars",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_agg_percentiles(
            queries, idx, "n_chars", (25.0, 50.0, 75.0, 99.0), cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_variable_width_histogram(sf_dir: str):
    """ES variable_width_histogram of n_chars over each derived query's
    match set — exact per-value count partials clustered by the
    deterministic adjacent-gap agglomerative spec (rows-only: the
    iterative merge is not SQL-expressible; pytest carries the exact
    hand-computed oracle)."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import (
        IndexSearcher,
        run_agg_variable_width_histogram,
    )

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_vwhidx_")
    try:
        cfg = EngineConfig(num_partitions=8, numeric_cols=("n_chars",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("n_chars",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_agg_variable_width_histogram(
            queries, idx, "n_chars", buckets=5, cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_percolate(sf_dir: str):
    """ES percolate (reverse search): every (doc, stored-query) match
    pair — queries 0-3 are the standard derived or-matches, query 4 is
    query 1's terms with operator=and.  Stored queries broadcast once;
    the corpus streams (no index needed)."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.pipelines.fulltext import (
        build_documents_index,
        derive_query_set,
        percolate,
    )
    from kafka_es_ray.query.engine import IndexSearcher
    from kafka_es_ray.sources.parquet import read_table

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_pcidx_")
    try:
        build_documents_index(sf_dir, idx)  # only for the query derivation
        queries = derive_query_set(IndexSearcher(idx))
        queries = queries[queries["text"] != "zzzabsentterm"].copy()
        and_row = pd.DataFrame(
            {
                "query_id": [4],
                "text": [queries.loc[queries["query_id"] == 1, "text"].iloc[0]],
                "operator": ["and"],
            }
        )
        queries = pd.concat([queries, and_row], ignore_index=True)
        docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
        out = percolate(docs, queries).to_pandas()
        return out.sort_values(["doc_id", "query_id"]).reset_index(drop=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_top_hits(sf_dir: str):
    """ES terms-agg + top_hits: every lang bucket's top-3 docs per
    derived query — distributed TopHitsStage (per-segment per-value
    top-n partials)."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_top_hits

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_thidx_")
    try:
        build_documents_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx))
        queries = queries[queries["text"] != "zzzabsentterm"]
        out = run_top_hits(queries, idx, "lang", n_hits=3).to_pandas()
        return (
            out[["query_id", "value", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "value", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_top_hits_sorted(sf_dir: str):
    """ES top_hits with `sort`: every lang bucket's top-3 docs ranked by
    the n_chars numeric field (desc, ties doc_id asc) instead of _score;
    the score column carries the sort value (the ES hit sort array)."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_top_hits

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_thsidx_")
    try:
        cfg = EngineConfig(num_partitions=8, numeric_cols=("n_chars",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("n_chars",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        out = run_top_hits(
            queries, idx, "lang", n_hits=3, cfg=cfg, sort_field="n_chars",
        ).to_pandas()
        return (
            out[["query_id", "value", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "value", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


_TOP_HITS_SORTED_SQL = _MATCHES_CTE + """
, hits AS (
  SELECT m.query_id, d.lang AS value, m.doc_id,
         d.n_chars::DOUBLE AS score,
         row_number() OVER (
           PARTITION BY m.query_id, d.lang
           ORDER BY d.n_chars DESC, m.doc_id ASC
         ) AS rank
  FROM matches m JOIN documents d USING (doc_id)
  WHERE d.n_chars IS NOT NULL
)
SELECT query_id, value, rank::BIGINT AS rank, doc_id, score
FROM hits WHERE rank <= 3 ORDER BY 1, 2, 3
"""


def _q_collapse_topk(sf_dir: str):
    """ES field collapsing: top-10 GROUPS (best doc per lang) per derived
    query — distributed CollapseTopkStage (per-segment best-per-value +
    top-k values; exactness argument in its docstring)."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_collapsed

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_clpidx_")
    try:
        build_documents_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx))
        queries = queries[queries["text"] != "zzzabsentterm"]
        out = run_collapsed(queries, idx, "lang", k=10).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score", "collapse_val"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_collapse_inner_hits(sf_dir: str):
    """ES field collapsing with inner_hits: top-10 lang groups per
    derived query, each with its own top-3 docs (inner_rank 1..3) — the
    TopHitsStage partial shape (no per-segment value cut; exactness in
    run_collapsed_inner_hits' docstring)."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_collapsed_inner_hits

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_cihidx_")
    try:
        build_documents_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx))
        queries = queries[queries["text"] != "zzzabsentterm"]
        out = run_collapsed_inner_hits(
            queries, idx, "lang", k=10, n_hits=3
        ).to_pandas()
        return (
            out[["query_id", "rank", "inner_rank", "doc_id", "score",
                 "collapse_val"]]
            .sort_values(["query_id", "rank", "inner_rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


# groups ranked by their best doc (rn=1), inner hits = each group's
# top-3 (the grouped rn), replayed over the same scores CTE
_COLLAPSE_INNER_SQL = _BM25_SQL.split("topk AS (")[0] + """grouped AS (
  SELECT s.query_id, d.lang, s.doc_id, round(s.raw_score, 6) AS score,
         row_number() OVER (
           PARTITION BY s.query_id, d.lang
           ORDER BY round(s.raw_score, 6) DESC, s.doc_id ASC
         ) AS rn
  FROM scores s JOIN documents d USING (doc_id)
),
groups AS (
  SELECT query_id, lang,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS grank
  FROM grouped WHERE rn = 1
)
SELECT gr.query_id, g.grank::BIGINT AS rank, gr.rn::BIGINT AS inner_rank,
       gr.doc_id, gr.score, gr.lang AS collapse_val
FROM grouped gr JOIN groups g ON g.query_id = gr.query_id AND g.lang = gr.lang
WHERE g.grank <= 10 AND gr.rn <= 3
ORDER BY 1, 2, 3
"""


def _q_function_score_topk(sf_dir: str):
    """ES function_score (field_value_factor, boost_mode=multiply):
    BM25 top-10 re-scored by ln1p(n_chars) — per-doc boost applied inside
    each shard's scoring pass, pruning disabled (a BM25 theta can't bound
    a boosted score)."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_fvfidx_")
    try:
        cfg = EngineConfig(num_partitions=8, numeric_cols=("n_chars",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("n_chars",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"].copy()
        queries["boost_field"] = "n_chars"
        queries["boost_modifier"] = "ln1p"
        out = run_queries(queries, idx, cfg).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_decay_gauss_topk(sf_dir: str):
    """ES function_score gauss decay (origin=200, scale=150, offset=25,
    decay=0.5, boost_mode=multiply): BM25 top-10 re-scored by the
    Gaussian proximity of n_chars to the origin — per-doc multiplier
    applied inside each shard's scoring pass, pruning disabled (a BM25
    theta can't bound a decayed score)."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_decayidx_")
    try:
        cfg = EngineConfig(num_partitions=8, numeric_cols=("n_chars",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("n_chars",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"].copy()
        queries["decay_field"] = "n_chars"
        queries["decay_function"] = "gauss"
        queries["decay_origin"] = 200.0
        queries["decay_scale"] = 150.0
        queries["decay_offset"] = 25.0
        queries["decay_decay"] = 0.5
        out = run_queries(queries, idx, cfg).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_rank_feature_topk(sf_dir: str):
    """ES rank_feature query (bool should context, saturation function):
    BM25 top-10 with score = round6(bm25 + 1.5 * n_chars/(n_chars+250))
    — additive per-doc feature boost inside each shard's scoring pass,
    pruning disabled (a BM25 theta can't bound a boosted score)."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_rfidx_")
    try:
        cfg = EngineConfig(num_partitions=8, numeric_cols=("n_chars",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("n_chars",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"].copy()
        queries["rf_field"] = "n_chars"
        queries["rf_function"] = "saturation"
        queries["rf_pivot"] = 250.0
        queries["rf_boost"] = 1.5
        out = run_queries(queries, idx, cfg).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_distance_feature_topk(sf_dir: str):
    """ES distance_feature query (bool should context, date flavor):
    BM25 top-10 with score = round6(bm25 + 2 * pivot/(pivot + |ts -
    origin|)) over the derived epoch-seconds ts — docs nearer the origin
    date rank higher; pruning disabled (theta can't bound a boosted
    score)."""
    import shutil

    from kafka_es_ray.query.engine import run_queries

    idx, cfg, queries = _agg_index_build(sf_dir, numeric=("ts",), derived=True)
    try:
        queries = queries.copy()
        queries["dfe_field"] = "ts"
        queries["dfe_origin"] = 1577836800.0 + 200.0 * 43200.0
        queries["dfe_pivot"] = 604800.0  # 7 days
        queries["dfe_boost"] = 2.0
        out = run_queries(queries, idx, cfg).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_string_stats(sf_dir: str):
    """ES string_stats aggregation over the lang keyword field per
    derived query's match set: value count, min/max/avg length and the
    Shannon entropy of the character distribution — lengths and char
    frequencies re-derived from the one terms-agg (value, n) sweep."""
    import shutil

    from kafka_es_ray.query.engine import run_string_stats

    idx, cfg, queries = _agg_index_build(sf_dir)
    try:
        return run_string_stats(queries, idx, "lang", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_top_metrics(sf_dir: str):
    """ES top_metrics aggregation: n_chars of each derived query's top-2
    match-set docs ranked by the derived ts sort field desc — the
    SortTopkStage sweep with metric columns gathered for per-segment
    winners only."""
    import shutil

    from kafka_es_ray.query.engine import run_top_metrics

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts", "n_chars"), derived=True
    )
    try:
        return run_top_metrics(
            queries, idx, "ts", ("n_chars",), ascending=False, n=2, cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_pinned_topk(sf_dir: str):
    """ES pinned query: external _ids "3" and "11" promoted (in that
    order, ES constant descending scores) above each derived query's
    organic BM25 top-10, pinned keys deduped out of the organic tail."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_pinned

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_pinidx_")
    try:
        cfg = EngineConfig(num_partitions=8)
        build_index(
            documents_dataset(sf_dir), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"].copy()
        queries["pinned"] = "3|11"
        return run_pinned(queries, idx, k=10, cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_script_score_topk(sf_dir: str):
    """ES script_score query (whitelisted expression subset): BM25
    top-10 re-scored by '_score * ln1p(n_chars) + sqrt(n_chars)' —
    vectorized AST evaluation inside each shard's scoring pass, pruning
    disabled; the script is parsed data, never eval'd."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_scridx_")
    try:
        cfg = EngineConfig(num_partitions=8, numeric_cols=("n_chars",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("n_chars",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"].copy()
        queries["script"] = "_score * ln1p(n_chars) + sqrt(n_chars)"
        out = run_queries(queries, idx, cfg).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_rank_eval(sf_dir: str):
    """ES _rank_eval: precision/recall/MRR/NDCG@10 of the distributed
    BM25 run, judged against and-match relevance labels produced by the
    distributed percolate op (docs containing ALL the query's terms are
    'relevant') — metric math on the driver over two small frames."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import (
        build_documents_index,
        derive_query_set,
        percolate,
    )
    from kafka_es_ray.query.engine import IndexSearcher, run_queries
    from kafka_es_ray.query.rank_eval import rank_eval
    from kafka_es_ray.sources.parquet import read_table

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_reidx2_")
    try:
        build_documents_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx))
        queries = queries[queries["text"] != "zzzabsentterm"].reset_index(drop=True)
        run = run_queries(queries, idx).to_pandas()
        qrels = percolate(
            read_table(sf_dir, "documents", columns=["doc_id", "text"]),
            queries.assign(operator="and"),
        ).to_pandas()
        return rank_eval(run, qrels, k=10)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_mtermvectors(sf_dir: str):
    """ES _mtermvectors: batch termvectors for the 5 smallest doc ids —
    one routed _mget for the sources, one dictionary-only df pass over
    the union of their terms."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import documents_dataset
    from kafka_es_ray.query.engine import run_mtermvectors

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_mtvidx_")
    try:
        cfg = EngineConfig(num_partitions=8, store_text=True)
        build_index(
            documents_dataset(sf_dir), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        ids = sorted(
            pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
            .column("doc_id").to_pylist()
        )[:5]
        return run_mtermvectors([str(i) for i in ids], idx, cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_termvectors(sf_dir: str):
    """ES _termvectors for the 3 smallest doc_ids: per-term tf (from the
    stored _source, the ES realtime path), global df, first position."""
    import shutil
    import tempfile

    import pandas as pd
    import pyarrow.parquet as pq

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_tvidx_")
    try:
        cfg = EngineConfig(num_partitions=8, store_text=True)
        build_index(
            documents_dataset(sf_dir), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        s = IndexSearcher(idx, cfg)
        ids = sorted(
            pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
            .column("doc_id").to_pylist()
        )[:3]
        out = []
        for qid, did in enumerate(ids):
            tv = s.termvectors(str(did))
            out.append(tv.assign(query_id=np.int64(qid)))
        return (
            pd.concat(out, ignore_index=True)[
                ["query_id", "term", "tf", "df", "first_pos"]
            ]
            .sort_values(["query_id", "term"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_more_like_this(sf_dir: str):
    """ES more_like_this for the 3 smallest doc_ids: top-10 tf-idf query
    terms from each source's stored _source (tf>=1, df>=2), BM25
    or-match, source doc excluded — distributed mget + run_queries."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import documents_dataset
    from kafka_es_ray.query.engine import run_more_like_this

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_mltidx_")
    try:
        cfg = EngineConfig(num_partitions=8, store_text=True)
        build_index(
            documents_dataset(sf_dir), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        src = sorted(ids.column("doc_id").to_pylist())[:3]
        out = run_more_like_this(
            [str(i) for i in src], idx,
            k=10, max_query_terms=10, min_term_freq=1, min_doc_freq=2, cfg=cfg,
        )
        return out[["query_id", "rank", "doc_id", "score"]].reset_index(drop=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_more_like_this_unlike(sf_dir: str):
    """ES more_like_this with `unlike`: same three sources, but the 4th
    smallest doc is a negative example — its analyzed terms are removed
    from every source's candidate set before selection."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import documents_dataset
    from kafka_es_ray.query.engine import run_more_like_this

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_mluidx_")
    try:
        cfg = EngineConfig(num_partitions=8, store_text=True)
        build_index(
            documents_dataset(sf_dir), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        ordered = sorted(ids.column("doc_id").to_pylist())
        out = run_more_like_this(
            [str(i) for i in ordered[:3]], idx,
            k=10, max_query_terms=10, min_term_freq=1, min_doc_freq=2,
            cfg=cfg, unlike=[str(ordered[3])],
        )
        return out[["query_id", "rank", "doc_id", "score"]].reset_index(drop=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_match_subagg(sf_dir: str):
    """ES sub-aggregation (terms bucket on lang -> nested stats over
    n_chars) per derived query's match set — distributed NumericAggStage
    grouped partials."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_agg_terms_stats

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_sagidx_")
    try:
        cfg = EngineConfig(num_partitions=8, numeric_cols=("n_chars",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("n_chars",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_agg_terms_stats(queries, idx, "lang", "n_chars", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_significant_terms(sf_dir: str):
    """ES significant_terms over the source keyword field per derived
    query's match set — terms-agg fg partials vs a match-all bg pass,
    JLH-scored with the exact integer cut (live docs on both sides)."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_significant_terms

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_sgtidx_")
    try:
        cfg = EngineConfig(num_partitions=8, keyword_cols=("source",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("source",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_significant_terms(queries, idx, "source", k=10, cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_significant_terms_bgfilter(sf_dir: str):
    """ES significant_terms with background_filter: the background is
    the OR-match set of the top-8 ranked terms (a superset of every
    derived query's match set — the ES subset contract), so significance
    is measured against the searchable slice instead of the whole
    index."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import (
        derive_query_set,
        derive_ranked_terms,
        documents_dataset,
    )
    from kafka_es_ray.query.engine import IndexSearcher, run_significant_terms

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_sgbidx_")
    try:
        cfg = EngineConfig(num_partitions=8, keyword_cols=("source",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("source",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        searcher = IndexSearcher(idx, cfg)
        queries = derive_query_set(searcher)
        queries = queries[queries["text"] != "zzzabsentterm"]
        bg_text = " ".join(derive_ranked_terms(searcher, 8))
        return run_significant_terms(
            queries, idx, "source", k=10, cfg=cfg,
            background_filter={"text": bg_text},
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


_SIGTERMS_BGF_SQL = _SIGTERMS_KW_SQL.replace(
    """bg AS (SELECT source AS value, count(*)::BIGINT AS bg_count FROM documents GROUP BY 1),
nn AS (SELECT count(*)::BIGINT AS n FROM documents),""",
    """bgm AS (
  SELECT DISTINCT tf.doc_id FROM tf JOIN ranked_terms rt ON rt.term = tf.term
  WHERE rt.r <= 8
),
bg AS (
  SELECT d.source AS value, count(*)::BIGINT AS bg_count
  FROM bgm JOIN documents d USING (doc_id) GROUP BY 1
),
nn AS (SELECT sum(bg_count)::BIGINT AS n FROM bg),""",
)
assert "bgm" in _SIGTERMS_BGF_SQL


def _sig_terms_with(sf_dir: str, heuristic: str):
    """significant_terms under an alternative ES significance heuristic
    (chi_square / mutual_information) — same fg/bg sweep, the driver
    reduce applies the 2x2-contingency formula (run_significant_terms
    docstring)."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_significant_terms

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_sghidx_")
    try:
        cfg = EngineConfig(num_partitions=8, keyword_cols=("source",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("source",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_significant_terms(
            queries, idx, "source", k=10, heuristic=heuristic, cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_significant_terms_chi2(sf_dir: str):
    return _sig_terms_with(sf_dir, "chi_square")


def _q_significant_terms_mi(sf_dir: str):
    return _sig_terms_with(sf_dir, "mutual_information")


def _q_rare_terms(sf_dir: str):
    """ES rare_terms aggregation per derived query's match set: terms
    with global df <= the corpus's 5th-smallest distinct df (data-derived
    threshold — the synthetic vocab has no absolutely-rare terms), ranked
    rarest-first."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_rare_terms

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_rareidx_")
    try:
        cfg = EngineConfig(num_partitions=8, store_text=True)
        build_index(
            documents_dataset(sf_dir), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        s = IndexSearcher(idx, cfg)
        df_map: dict[str, int] = {}
        for seg in s.segments:
            for t, d in zip(seg.terms, seg.df):
                df_map[t] = df_map.get(t, 0) + int(d)
        distinct = sorted(set(df_map.values()))
        thresh = distinct[min(4, len(distinct) - 1)]
        queries = derive_query_set(s)
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_rare_terms(queries, idx, k=10, max_doc_count=thresh, cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_match_cardinality(sf_dir: str):
    """ES cardinality aggregation (exact flavor for oracle parity):
    distinct lang values per derived query's match set; the HLL flavor
    (the ES default, constant shuffle at any cardinality) is pytest-
    verified against this exact path."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_agg_cardinality

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_cardidx_")
    try:
        build_documents_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_agg_cardinality(queries, idx, "lang", exact=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_categorize_text(sf_dir: str):
    """ES categorize_text aggregation per derived query's match set:
    top-10 categories by the frozen digit-masked first-5-tokens key —
    segment-parallel stored-_source re-analysis partials + one bucketed
    (plan, category) exchange."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_categorize_text

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_catidx_")
    try:
        cfg = EngineConfig(num_partitions=8, store_text=True)
        build_index(
            documents_dataset(sf_dir), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_categorize_text(queries, idx, size=10, max_tokens=5, cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_significant_text(sf_dir: str):
    """ES significant_text aggregation per derived query's match set:
    top-10 JLH-scored terms (fg vs whole-corpus bg), min_doc_count=3 —
    two segment-parallel passes (SignificantTextStage re-analysis of the
    stored _source + dictionary-only bg df gather)."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_significant_text

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_sigidx_")
    try:
        cfg = EngineConfig(num_partitions=8, store_text=True)
        build_index(
            documents_dataset(sf_dir), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_significant_text(queries, idx, k=10, min_doc_count=3, cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_match_histogram(sf_dir: str):
    """ES histogram aggregation (interval=50 buckets of n_chars) over
    each derived query's match set — distributed NumericAggStage path."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_agg_histogram

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_hstidx_")
    try:
        cfg = EngineConfig(num_partitions=8, numeric_cols=("n_chars",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("n_chars",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_agg_histogram(queries, idx, "n_chars", 50.0, cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _agg_index_build(sf_dir: str, *, numeric=(), keyword=(), derived=False):
    """Shared builder for the aggregation-family wrappers: a temp
    documents index with the requested numeric/keyword doc-store columns;
    ``derived`` adds ts (epoch seconds, deterministic from doc_id) and
    n_tokens (analyzer token count — the tokenizer ≡ DuckDB contract).
    Returns (index_dir, cfg, derived match queries)."""
    import tempfile

    import numpy as _np
    import pandas as _pd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.functions.tokenizer import get_analyzer
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_aggx_")
    cfg = EngineConfig(
        num_partitions=8, numeric_cols=tuple(numeric), keyword_cols=tuple(keyword)
    )
    extra = tuple(c for c in (*numeric, *keyword) if c not in ("ts", "n_tokens"))
    ds = documents_dataset(sf_dir, extra_cols=extra)
    if derived:
        an = get_analyzer("en")

        def add_derived(batch: _pd.DataFrame) -> _pd.DataFrame:
            batch["ts"] = (
                1577836800 + (batch["doc_id"].astype(_np.int64) % 400) * 43200
            )
            batch["n_tokens"] = (
                an.tokenize_series(batch["text"]).map(len).astype(_np.int64)
            )
            return batch

        ds = ds.map_batches(add_derived, batch_format="pandas")
    build_index(
        ds, idx, cfg,
        key_col="key", lang_col="lang", html_col=None, ts_col=None,
        id_col="doc_id",
    )
    queries = derive_query_set(IndexSearcher(idx, cfg))
    return idx, cfg, queries[queries["text"] != "zzzabsentterm"]


def _q_filters_agg(sf_dir: str):
    """ES filters aggregation: named lang term-filter buckets (english=
    en, german=de, absent=xx) + the _other_ bucket per derived query's
    match set — one terms-agg partial sweep, named mapping at the driver
    reduce.  Zero-count named buckets are emitted like ES."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_filters

    idx, cfg, queries = _agg_index_build(sf_dir)
    try:
        return run_agg_filters(
            queries, idx, "lang",
            {"english": "en", "german": "de", "absent": "xx"}, cfg=cfg,
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_random_sampler_agg(sf_dir: str):
    """ES random_sampler aggregation: lang terms sub-agg over the p=0.3
    per-doc deterministic sample (seed 42, the sampling md5 contract) of
    each derived query's match set, counts scaled by 1/p — the sampling
    happens inside the per-segment sweep, so only sampled-value partials
    leave the shard."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_random_sampler

    idx, cfg, queries = _agg_index_build(sf_dir)
    try:
        return run_agg_random_sampler(
            queries, idx, "lang", probability=0.3, seed=42, cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_adjacency_matrix(sf_dir: str):
    """ES adjacency_matrix aggregation: named filters eng(lang=en),
    ger(lang=de), s1(source=src1) + pairwise intersections per derived
    query's match set — one composite partial sweep, matrix cells at the
    driver reduce; zero-count buckets omitted like ES."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_adjacency_matrix

    idx, cfg, queries = _agg_index_build(sf_dir, keyword=("source",))
    try:
        return run_agg_adjacency_matrix(
            queries, idx,
            {"eng": ("lang", "en"), "ger": ("lang", "de"), "s1": ("source", "src1")},
            cfg=cfg,
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_extended_stats(sf_dir: str):
    """ES extended_stats aggregation over n_chars per derived query's
    match set: count/min/max/sum/avg plus sum_of_squares, population
    variance and std_deviation via exact-sum formulas (distributed
    NumericAggStage stats partials + ss)."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_extended_stats

    idx, cfg, queries = _agg_index_build(sf_dir, numeric=("n_chars",))
    try:
        return run_agg_extended_stats(queries, idx, "n_chars", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_date_histogram(sf_dir: str):
    """ES date_histogram (calendar_interval=month) over an epoch-seconds
    field per derived query's match set; bucket key = month-start epoch
    seconds.  ts is deterministic from doc_id (documents carries no
    timestamp) — the oracle replays the same expression."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_date_histogram

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts",), derived=True
    )
    try:
        return run_agg_date_histogram(queries, idx, "ts", "month", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_date_histogram_fixed(sf_dir: str):
    """ES date_histogram fixed_interval=7d: epoch-anchored fixed-width
    buckets (ts // 604800 * 604800) per derived query's match set."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_date_histogram

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts",), derived=True
    )
    try:
        return run_agg_date_histogram(queries, idx, "ts", "7d", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_date_histogram_filled(sf_dir: str):
    """ES date_histogram with min_doc_count=0 (the ES default): every
    calendar month between each query's first and last non-empty bucket
    is emitted, gaps as n_docs=0 — driver-side enumeration over the tiny
    bucket frame (the ES reduce-phase behavior)."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_date_histogram

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts",), derived=True
    )
    try:
        return run_agg_date_histogram(
            queries, idx, "ts", "month", cfg=cfg, min_doc_count=0
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_range_agg(sf_dir: str):
    """ES range aggregation with explicit edges over n_chars per derived
    query's match set (bucket key = the range's lower edge)."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_range

    idx, cfg, queries = _agg_index_build(sf_dir, numeric=("n_chars",))
    try:
        return run_agg_range(
            queries, idx, "n_chars", (0.0, 100.0, 200.0, 300.0, 450.0), cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_date_range_keyed_agg(sf_dir: str):
    """ES date_range aggregation (keyed from/to form) per derived query:
    ISO-date from/to buckets with the [from, to) contract (either side
    open, overlapping ranges independent, empty ranges kept at 0) over
    the derived epoch-seconds ts column — (query, range) count plans
    through the shared MatchSet sweep."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_date_range

    idx, cfg, queries = _agg_index_build(sf_dir, numeric=("ts",), derived=True)
    try:
        ranges = [
            {"to": "2020-03-01"},
            {"from": "2020-03-01", "to": "2020-05-01"},
            {"from": "2020-02-15T12:00:00", "to": "2020-03-01"},
            {"from": "2020-05-01"},
        ]
        return run_agg_date_range(queries, idx, "ts", ranges, cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_matrix_stats(sf_dir: str):
    """ES matrix_stats over the (n_chars, n_tokens) field pair per
    derived query's match set: population means/variances, covariance and
    Pearson correlation from exact cross-moment partials."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_matrix_stats

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("n_chars", "n_tokens"), derived=True
    )
    try:
        return run_agg_matrix_stats(queries, idx, ("n_chars", "n_tokens"), cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_composite_agg(sf_dir: str):
    """ES composite aggregation over sources (lang, source) per derived
    query's match set: first page of 8 buckets ordered by key asc (the
    after_key paging contract is pytest-covered)."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_composite

    idx, cfg, queries = _agg_index_build(sf_dir, keyword=("source",))
    try:
        return run_agg_composite(queries, idx, ("lang", "source"), size=8, cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_composite_date_agg(sf_dir: str):
    """ES composite aggregation with a date_histogram source: doc counts
    per (lang, calendar month of ts) key tuple, key-ascending (the
    "ts:month" source form; month column = bucket-start epoch int)."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_composite

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts",), derived=True
    )
    try:
        return run_agg_composite(
            queries, idx, ("lang", "ts:month"), size=100, cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


_COMPOSITE_DATE_SQL = _AGG_VALS_CTE + """
SELECT query_id, lang,
       epoch(date_trunc('month', to_timestamp(ts)))::BIGINT AS ts_month,
       count(*)::BIGINT AS n_docs
FROM vals GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def _q_cumulative_sum(sf_dir: str):
    """ES cumulative_sum pipeline aggregation: running total of a sum
    sub-agg (n_chars) over month date_histogram buckets per derived
    query — one distributed NumericAggStage sweep, pipeline step at the
    driver reduce (the ES coordinating-node phase)."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_cumulative_sum

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts", "n_chars"), derived=True
    )
    try:
        return run_agg_cumulative_sum(queries, idx, "ts", "n_chars", "month", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_derivative(sf_dir: str):
    """ES derivative pipeline aggregation: per-bucket change of the sum
    sub-agg (n_chars) vs the previous month bucket; the first bucket of
    each query emits no derivative (ES omits it)."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_derivative

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts", "n_chars"), derived=True
    )
    try:
        return run_agg_derivative(queries, idx, "ts", "n_chars", "month", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_bucket_script(sf_dir: str):
    """ES bucket_script + bucket_selector pipeline aggregations: per
    month bucket avg_val = sum(n_chars) / _count (bucket_script), with
    buckets under 5 docs dropped (bucket_selector)."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_bucket_script

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts", "n_chars"), derived=True
    )
    try:
        return run_agg_bucket_script(
            queries, idx, "ts", "n_chars", "month", min_docs=5, cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_stats_bucket(sf_dir: str):
    """ES stats_bucket sibling pipeline aggregation (covers min/max/sum/
    avg_bucket): stats over the per-month sum sub-agg values, one row
    per derived query."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_stats_bucket

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts", "n_chars"), derived=True
    )
    try:
        return run_agg_stats_bucket(queries, idx, "ts", "n_chars", "month", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_extended_stats_bucket(sf_dir: str):
    """ES extended_stats_bucket sibling pipeline aggregation: population
    variance/std + ±2σ bounds over the per-month sum(n_chars) sub-agg
    values, one row per derived query."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_extended_stats_bucket

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts", "n_chars"), derived=True
    )
    try:
        return run_agg_extended_stats_bucket(queries, idx, "ts", "n_chars", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_percentiles_bucket(sf_dir: str):
    """ES percentiles_bucket sibling pipeline aggregation: nearest-rank
    percentiles (25/50/75/99, round(p/100*(n-1)) index — the ES
    no-interpolation rule) over the per-month sum(n_chars) sub-agg
    values, one row per (derived query, percent)."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_percentiles_bucket

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts", "n_chars"), derived=True
    )
    try:
        return run_agg_percentiles_bucket(queries, idx, "ts", "n_chars", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_moving_percentiles(sf_dir: str):
    """ES moving_percentiles pipeline aggregation: trailing 3-bucket
    nearest-rank p50 of the per-month sum(n_chars) sub-agg per derived
    query (window includes the current bucket, shift=1)."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_moving_percentiles

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts", "n_chars"), derived=True
    )
    try:
        return run_agg_moving_percentiles(
            queries, idx, "ts", "n_chars", window=3, percent=50.0, cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_avg_bucket(sf_dir: str):
    """ES avg_bucket sibling pipeline aggregation: mean of the per-month
    sum(n_chars) sub-agg values per derived query (gap_policy=skip)."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_fold_bucket

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts", "n_chars"), derived=True
    )
    try:
        return run_agg_fold_bucket(queries, idx, "ts", "n_chars", "avg", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_sum_bucket(sf_dir: str):
    """ES sum_bucket sibling pipeline aggregation: sum of the per-month
    sum(n_chars) sub-agg values per derived query."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_fold_bucket

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts", "n_chars"), derived=True
    )
    try:
        return run_agg_fold_bucket(queries, idx, "ts", "n_chars", "sum", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_max_bucket(sf_dir: str):
    """ES max_bucket sibling pipeline aggregation: the bucket key(s)
    attaining the max per-month sum(n_chars) sub-agg per derived query
    (one row per attaining bucket — the ES keys array)."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_extremum_bucket

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts", "n_chars"), derived=True
    )
    try:
        return run_agg_extremum_bucket(queries, idx, "ts", "n_chars", "max", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_min_bucket(sf_dir: str):
    """ES min_bucket sibling pipeline aggregation: the bucket key(s)
    attaining the min per-month sum(n_chars) sub-agg per derived query."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_extremum_bucket

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts", "n_chars"), derived=True
    )
    try:
        return run_agg_extremum_bucket(queries, idx, "ts", "n_chars", "min", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_runtime_stats_agg(sf_dir: str):
    """ES stats aggregation over a runtime field (runtime_mappings):
    n/min/max/sum/avg of the script value n_chars + 2*n_tokens per
    derived query's match set — the NumericAggStage {"script": ...}
    virtual-field partial mode (missing inputs read 0.0, so every
    match-set doc has a value)."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_stats

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts", "n_chars", "n_tokens"), derived=True
    )
    try:
        return run_agg_stats(
            queries, idx, {"script": "n_chars + 2 * n_tokens"}, cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_change_point_agg(sf_dir: str):
    """ES change_point pipeline aggregation (deterministic spike / dip /
    step_change / stationary detectors over the monthly bucket counts).
    Rows-only: the leave-one-out z and argmin-SSE split are not cleanly
    SQL-expressible; correctness comes from the planted-shape pytest."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_change_point

    idx, cfg, queries = _agg_index_build(sf_dir, numeric=("ts",), derived=True)
    try:
        return run_agg_change_point(queries, idx, "ts", "month", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_runtime_histogram_agg(sf_dir: str):
    """ES histogram aggregation over a runtime field: interval-50
    buckets of the script value n_chars + 2*n_tokens per derived query's
    match set — the NumericAggStage {"script": ...} virtual-field
    histogram mode."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_histogram

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts", "n_chars", "n_tokens"), derived=True
    )
    try:
        return run_agg_histogram(
            queries, idx, {"script": "n_chars + 2 * n_tokens"}, 50.0, cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_bucket_correlation(sf_dir: str):
    """ES bucket_correlation pipeline aggregation (Pearson core): per
    derived query, the correlation between the monthly date_histogram
    doc counts and the indicator (bucket_ts // 86400) % 7 — exact
    integer moment sums feed one double formula on both engines."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_bucket_correlation

    idx, cfg, queries = _agg_index_build(sf_dir, numeric=("ts",), derived=True)
    try:
        return run_agg_bucket_correlation(
            queries, idx, "ts", lambda ts: (ts // 86400) % 7,
            calendar_interval="month", cfg=cfg,
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_bucket_count_ks(sf_dir: str):
    """ES bucket_count_ks_test pipeline aggregation (two-sided statistic
    vs uniform fractions): per derived query, the KS distance between
    the monthly bucket-count ECDF (bucket_ts order) and the uniform
    CDF i/n_buckets."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_bucket_count_ks_test

    idx, cfg, queries = _agg_index_build(sf_dir, numeric=("ts",), derived=True)
    try:
        return run_agg_bucket_count_ks_test(
            queries, idx, "ts", calendar_interval="month", cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_moving_fn(sf_dir: str):
    """ES moving_fn pipeline aggregation (unweightedAvg): trailing
    3-bucket mean of the per-month sum(n_chars) sub-agg per derived
    query; leading buckets average what is available."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_moving_fn

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts", "n_chars"), derived=True
    )
    try:
        return run_agg_moving_fn(
            queries, idx, "ts", "n_chars", window=3, calendar_interval="month", cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_serial_diff(sf_dir: str):
    """ES serial_diff pipeline aggregation (lag=2): change of the
    per-month sum(n_chars) sub-agg vs two buckets back; the first two
    buckets of each query emit nothing."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_serial_diff

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts", "n_chars"), derived=True
    )
    try:
        return run_agg_serial_diff(
            queries, idx, "ts", "n_chars", lag=2, calendar_interval="month", cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_auto_date_histogram(sf_dir: str):
    """ES auto_date_histogram (target 8 buckets): smallest calendar
    interval from day/week/month/year fitting each derived query's ts
    range — one day-granularity sweep, exact driver roll-up."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_auto_date_histogram

    idx, cfg, queries = _agg_index_build(sf_dir, numeric=("ts",), derived=True)
    try:
        return run_agg_auto_date_histogram(
            queries, idx, "ts", target_buckets=8, cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_bucket_sort(sf_dir: str):
    """ES bucket_sort pipeline aggregation: keep the top-3 month buckets
    per derived query ranked by the sum(n_chars) sub-agg desc (ties
    bucket_ts asc) — the coordinating-node sort + size truncation."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_bucket_sort

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts", "n_chars"), derived=True
    )
    try:
        return run_agg_bucket_sort(
            queries, idx, "ts", "n_chars", size=3, calendar_interval="month", cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_normalize(sf_dir: str):
    """ES normalize pipeline aggregation (percent_of_sum): each month
    bucket's sum(n_chars) as a share of the derived query's total."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_normalize

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("ts", "n_chars"), derived=True
    )
    try:
        return run_agg_normalize(
            queries, idx, "ts", "n_chars",
            method="percent_of_sum", calendar_interval="month", cfg=cfg,
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_weighted_avg(sf_dir: str):
    """ES weighted_avg aggregation: n_chars weighted by the analyzer
    token count per derived query's match set — one matrix-stats
    cross-moment sweep (sxy/sy)."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_weighted_avg

    idx, cfg, queries = _agg_index_build(
        sf_dir, numeric=("n_chars", "n_tokens"), derived=True
    )
    try:
        return run_agg_weighted_avg(queries, idx, "n_chars", "n_tokens", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_multi_terms(sf_dir: str):
    """ES multi_terms aggregation: buckets keyed by the (lang, source)
    tuple per derived query's match set, ranked n_docs desc (ties key
    asc), top 10 — the composite partial sweep with the terms-agg
    reduce order."""
    import shutil

    from kafka_es_ray.query.engine import run_multi_terms

    idx, cfg, queries = _agg_index_build(sf_dir, keyword=("source",))
    try:
        return run_multi_terms(queries, idx, ("lang", "source"), size=10, cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_mad_agg(sf_dir: str):
    """ES median_absolute_deviation aggregation (exact nearest-rank,
    where ES would tdigest): median of each derived query's match-set
    n_chars then the median of |v - median| — one per-value count
    sweep, deviations re-derived on the driver."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_median_absolute_deviation

    idx, cfg, queries = _agg_index_build(sf_dir, numeric=("n_chars",))
    try:
        return run_agg_median_absolute_deviation(queries, idx, "n_chars", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_sampler_agg(sf_dir: str):
    """ES sampler aggregation (deterministic global flavor): lang terms
    sub-agg over only the top-25 best-scoring docs per derived query
    (score desc, doc_id asc) — the sample, never the match set, leaves
    the cluster."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_sampler

    idx, cfg, queries = _agg_index_build(sf_dir)
    try:
        return run_agg_sampler(queries, idx, "lang", shard_size=25, cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_diversified_sampler_agg(sf_dir: str):
    """ES diversified_sampler aggregation: top-25 sample per derived
    query de-biased to at most 3 docs per source (rank order), then a
    lang terms sub-agg over the diversified sample."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_sampler

    idx, cfg, queries = _agg_index_build(sf_dir, keyword=("source",))
    try:
        return run_agg_sampler(
            queries, idx, "lang", shard_size=25,
            diversify_field="source", max_docs_per_value=3, cfg=cfg,
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_validate_query(sf_dir: str):
    """ES _validate/query: per-row accept/reject verdicts (plan-time
    errors caught in isolation) over a fixed probe set — one valid
    match, an undecodable wrapper, a malformed weighted_terms pair and
    an unsupported fuzziness.  Error text stays engine-side (brittle to
    pin in SQL); the verdict column is the contract."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_validate

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_validx_")
    try:
        build_documents_index(sf_dir, idx)
        w1 = derive_ranked_terms(IndexSearcher(idx), 1)[0]
        q = pd.DataFrame(
            {
                "query_id": np.arange(4, dtype=np.int64),
                "text": [w1, "notbase64!!", f"{w1}:notafloat", w1],
                "type": [None, "wrapper", "weighted_terms", None],
                "fuzziness": [None, None, None, 3],
            }
        )
        return run_validate(q, idx)[["query_id", "valid"]]
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_terms_size_agg(sf_dir: str):
    """ES terms aggregation with size=5 + shard_size=100 over the source
    keyword field: per-shard candidate truncation (exact here since 20
    sources << shard_size -> doc_count_error_upper_bound = 0), global
    top-5 buckets per derived query in ES order."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_terms

    idx, cfg, queries = _agg_index_build(sf_dir, keyword=("source",))
    try:
        return run_agg_terms(
            queries, idx, "source", cfg=cfg, size=5, shard_size=100
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_scripted_metric_agg(sf_dir: str):
    """ES scripted_metric (whitelisted-expression subset): map =
    n_chars * 2 + 10 per matched doc, combine = per-segment sum,
    reduce = sum — plus min/max of the mapped values, one stats-partial
    sweep."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_scripted_metric

    idx, cfg, queries = _agg_index_build(sf_dir, numeric=("n_chars",))
    try:
        return run_agg_scripted_metric(
            queries, idx, "n_chars * 2.0 + 10.0", cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_global_agg(sf_dir: str):
    """ES global aggregation: alongside a filtered query's lang buckets
    (query 0, the df-top term), the global bucket (query 1) aggregates
    over ALL docs regardless of the query — modeled as an exists=lang
    match-all plan through the same one terms-agg partial sweep."""
    import shutil

    import pandas as pd

    from kafka_es_ray.query.engine import run_agg_terms

    idx, cfg, queries = _agg_index_build(sf_dir)
    try:
        q0 = queries[queries["query_id"] == 0].copy()
        q = pd.concat(
            [q0, pd.DataFrame({"query_id": [1], "text": [""], "exists": ["lang"]})],
            ignore_index=True,
        )
        return run_agg_terms(q, idx, "lang", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_rate_agg(sf_dir: str):
    """ES rate aggregation (date_histogram month buckets, unit=day):
    docs-per-day rate per month bucket — the month's actual day count is
    the divisor (ES unit-conversion semantics)."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_rate

    idx, cfg, queries = _agg_index_build(sf_dir, numeric=("ts",), derived=True)
    try:
        return run_agg_rate(queries, idx, "ts", "month", "day", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_date_range_agg(sf_dir: str):
    """ES date_range aggregation: explicit month-start epoch edges over
    the derived ts (bucket key = the range's "from"; below-first-edge
    docs fall in no range, last range open-ended) — the range-agg
    partial mode on a date field."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_range

    idx, cfg, queries = _agg_index_build(sf_dir, numeric=("ts",), derived=True)
    try:
        # 2020-01-01, 2020-03-01, 2020-05-01 epoch seconds
        return run_agg_range(
            queries, idx, "ts", (1577836800.0, 1583020800.0, 1588291200.0), cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_t_test_agg(sf_dir: str):
    """ES t_test aggregation (heteroscedastic/Welch) between pairs of
    derived filter queries over n_chars: one stats-partial sweep,
    exact-sum sample variances, t statistic + Welch-Satterthwaite dof
    (ES's p-value needs betainc — the statistic is what a SQL oracle can
    replay bit-for-bit before the 6dp round)."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_t_test

    idx, cfg, queries = _agg_index_build(sf_dir, numeric=("n_chars",))
    try:
        return run_agg_t_test(
            queries, idx, "n_chars", pairs=((0, 1), (2, 3)), cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_boxplot_agg(sf_dir: str):
    """ES boxplot aggregation (exact nearest-rank flavor, where ES would
    tdigest): min/max, q1/q2/q3 and the 1.5*IQR whiskers of n_chars over
    each derived query's match set — one per-value count sweep."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_boxplot

    idx, cfg, queries = _agg_index_build(sf_dir, numeric=("n_chars",))
    try:
        return run_agg_boxplot(queries, idx, "n_chars", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _missing_index_build(sf_dir: str):
    """Index with deterministic n_chars missingness (nulled where
    doc_id % 7 == 0 — the exists-query fixture rule) + the derived
    match queries, for the missing / value_count aggregations."""
    import tempfile

    import pyarrow as pa
    import pyarrow.compute as pc

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_missx_")
    cfg = EngineConfig(num_partitions=8, numeric_cols=("n_chars",))

    def blank(b: pa.Table) -> pa.Table:
        miss = pc.equal(pa.array(b.column("doc_id").to_numpy() % 7), pa.scalar(0))
        nulled = pc.if_else(miss, pa.scalar(None, pa.int64()), b.column("n_chars"))
        return b.set_column(b.schema.get_field_index("n_chars"), "n_chars", nulled)

    ds = documents_dataset(sf_dir, extra_cols=("n_chars",)).map_batches(
        blank, batch_format="pyarrow"
    )
    build_index(
        ds, idx, cfg,
        key_col="key", lang_col="lang", html_col=None, ts_col=None,
        id_col="doc_id",
    )
    queries = derive_query_set(IndexSearcher(idx, cfg))
    return idx, cfg, queries[queries["text"] != "zzzabsentterm"]


def _q_missing_agg(sf_dir: str):
    """ES missing aggregation: match-set docs whose n_chars has no value
    (deterministically nulled where doc_id % 7 == 0) per derived query —
    the exists-query complement in one NumericAggStage sweep."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_missing

    idx, cfg, queries = _missing_index_build(sf_dir)
    try:
        return run_agg_missing(queries, idx, "n_chars", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_value_count(sf_dir: str):
    """ES value_count aggregation: number of extracted n_chars values
    (missing excluded — same nulling rule as missing_agg) per derived
    query's match set."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_value_count

    idx, cfg, queries = _missing_index_build(sf_dir)
    try:
        return run_agg_value_count(queries, idx, "n_chars", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_percentile_ranks(sf_dir: str):
    """ES percentile_ranks aggregation (exact, the inverse of
    percentiles): percent of each derived query's match-set n_chars
    values <= v for v in (200, 350, 500) — same per-value count partials
    as the percentiles path."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_agg_percentile_ranks

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_pcrkidx_")
    try:
        cfg = EngineConfig(num_partitions=8, numeric_cols=("n_chars",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("n_chars",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_agg_percentile_ranks(
            queries, idx, "n_chars", (200.0, 350.0, 500.0), cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_explain_score(sf_dir: str):
    """ES _explain: the BM25 per-term breakdown (df, tf, round6'd
    contribution) of each derived query's rank-1 hit — distributed
    ExplainStage sweep over segments, O(|pairs| x |terms|) rows."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_explain, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_explidx_")
    try:
        build_documents_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx))
        queries = queries[queries["text"] != "zzzabsentterm"].reset_index(drop=True)
        top = run_queries(queries, idx).to_pandas()
        pairs = top[top["rank"] == 1][["query_id", "doc_id"]].merge(
            queries[["query_id", "text", "lang"]], on="query_id"
        )
        return run_explain(pairs, idx)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_scroll_all(sf_dir: str):
    """ES scroll / deep pagination: EVERY match of each derived query in
    global rank order, fetched as repeated distributed search_after
    pages (page_size=100) — exercises cursor correctness across many
    page boundaries (no dupes, no skips)."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_scroll

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_scrollidx_")
    try:
        build_documents_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx))
        queries = queries[queries["text"] != "zzzabsentterm"].reset_index(drop=True)
        out = run_scroll(queries, idx, page_size=100)
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_scroll_sliced(sf_dir: str):
    """ES sliced scroll (slice: {id, max:3}): the full match set of each
    derived query partitioned into 3 disjoint hash-of-doc_id slices with
    slice-local ranks — ONE distributed scroll partitioned afterwards
    (the Ray-right shape; ES re-runs the scan per slice client-side)."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_sliced_scroll

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_sscrollidx_")
    try:
        build_documents_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx))
        queries = queries[queries["text"] != "zzzabsentterm"].reset_index(drop=True)
        out = run_sliced_scroll(queries, idx, slice_max=3, page_size=100)
        return (
            out[["query_id", "slice_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "slice_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _parent_join_index(sf_dir: str, idx: str):
    """orders (parents) + lineitems (children) in ONE index with
    routing = the parent order key — the ES `join` field co-location
    contract, so has_child/has_parent run shard-locally with zero
    exchange.  (Driver-side frame build is test-scale convenience; at
    scale the two parquet reads union as Datasets before build_index.)"""
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index

    o = pd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_orderpriority"],
    )
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
                 "l_quantity"],
    )
    # the synthetic lineitem repeats (orderkey, linenumber) pairs, so the
    # ES _id is a CONTENT hash of the row — exact duplicates collapse to
    # one doc (the ES same-_id upsert), distinct rows stay distinct; the
    # oracle reproduces the identical md5 over SELECT DISTINCT
    import hashlib as _hl

    li = li.drop_duplicates().reset_index(drop=True)
    sig = (
        li["l_orderkey"].astype(str) + "-" + li["l_linenumber"].astype(str)
        + "-" + li["l_returnflag"] + li["l_linestatus"]
        + li["l_quantity"].astype(np.int64).astype(str)
    )
    child_key = "L" + sig.map(
        lambda s: _hl.md5(s.encode()).hexdigest()[:12]
    )
    parents = pd.DataFrame(
        {
            "key": "O" + o["o_orderkey"].astype(str),
            "text": "order " + o["o_orderstatus"],
            "lang": "en",
            "routing": o["o_orderkey"].astype(str),
            "join_name": "parent",
            "parent_key": "",
            "o_orderpriority": o["o_orderpriority"],
            "l_returnflag": "",
            "l_quantity": np.nan,
        }
    )
    children = pd.DataFrame(
        {
            "key": child_key,
            "text": "line " + li["l_returnflag"] + " " + li["l_linestatus"],
            "lang": "en",
            "routing": li["l_orderkey"].astype(str),
            "join_name": "child",
            "parent_key": "O" + li["l_orderkey"].astype(str),
            "o_orderpriority": "",
            "l_returnflag": li["l_returnflag"],
            "l_quantity": li["l_quantity"].astype(float),
        }
    )
    cfg = EngineConfig(
        num_partitions=8,
        keyword_cols=("join_name", "parent_key", "o_orderpriority",
                      "l_returnflag"),
        numeric_cols=("l_quantity",),
    )
    build_index(
        rd.from_pandas(pd.concat([parents, children], ignore_index=True)),
        idx, cfg, key_col="key", lang_col="lang", html_col=None,
        ts_col=None, routing_col="routing",
    )
    return cfg


def _q_has_child(sf_dir: str):
    """ES has_child query over the parent-join index: orders with >= 2
    lineitems matching (l_returnflag='R' AND l_quantity>=30) — one
    shard-local sweep, no exchange (co-location contract)."""
    import shutil
    import tempfile

    from kafka_es_ray.query.parent_join import run_has_child

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_pjidx_")
    try:
        cfg = _parent_join_index(sf_dir, idx)
        out = run_has_child(
            idx,
            {"kw": [("l_returnflag", "R")], "range": [("l_quantity", 30.0, None)]},
            min_children=2, cfg=cfg,
        ).to_pandas()
        return out.sort_values("key").reset_index(drop=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_has_parent(sf_dir: str):
    """ES has_parent query over the parent-join index: lineitems whose
    order is 1-URGENT."""
    import shutil
    import tempfile

    from kafka_es_ray.query.parent_join import run_has_parent

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_pjidx_")
    try:
        cfg = _parent_join_index(sf_dir, idx)
        out = run_has_parent(
            idx, {"kw": [("o_orderpriority", "1-URGENT")]}, cfg=cfg
        ).to_pandas()
        return out.sort_values("key").reset_index(drop=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


# child doc identity = content hash over the distinct 5-column row
# (exact duplicates collapse like same-_id upserts in ES)
_CHILD_DOCS_SQL = """
child_docs AS (
  SELECT l_orderkey, l_returnflag, l_quantity,
         'L' || substr(md5(
             CAST(l_orderkey AS VARCHAR) || '-' ||
             CAST(l_linenumber AS VARCHAR) || '-' ||
             l_returnflag || l_linestatus ||
             CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
         ), 1, 12) AS key
  FROM (SELECT DISTINCT l_orderkey, l_linenumber, l_returnflag,
               l_linestatus, l_quantity FROM lineitem)
)
"""

_HAS_CHILD_SQL = (
    "WITH " + _CHILD_DOCS_SQL + """
SELECT 'O' || CAST(o_orderkey AS VARCHAR) AS key, count(*)::BIGINT AS n_children
FROM orders JOIN child_docs ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R' AND l_quantity >= 30
GROUP BY o_orderkey
HAVING count(*) >= 2
ORDER BY 1
"""
)

_HAS_PARENT_SQL = (
    "WITH " + _CHILD_DOCS_SQL + """
SELECT c.key AS key, 'O' || CAST(c.l_orderkey AS VARCHAR) AS parent
FROM child_docs c JOIN orders ON o_orderkey = c.l_orderkey
WHERE o_orderpriority = '1-URGENT'
ORDER BY 1
"""
)


def _q_children_terms_agg(sf_dir: str):
    """ES `children` aggregation (terms sub-agg): l_returnflag counts
    over the lineitems of 1-URGENT orders — shard-local partials only."""
    import shutil
    import tempfile

    from kafka_es_ray.query.parent_join import run_children_terms_agg

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_pjidx_")
    try:
        cfg = _parent_join_index(sf_dir, idx)
        return run_children_terms_agg(
            idx, {"kw": [("o_orderpriority", "1-URGENT")]}, "l_returnflag",
            cfg=cfg,
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


_CHILDREN_TERMS_SQL = (
    "WITH " + _CHILD_DOCS_SQL + """
SELECT c.l_returnflag AS value, count(*)::BIGINT AS n
FROM child_docs c JOIN orders ON o_orderkey = c.l_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY 1
ORDER BY n DESC, value ASC
"""
)


def _q_has_child_inner_hits(sf_dir: str):
    """ES has_child with inner_hits: orders with >= 1 lineitem matching
    (l_returnflag='R' AND l_quantity>=30), each with its first 3 matching
    children by child key asc (filter context — key order is the
    deterministic rule)."""
    import shutil
    import tempfile

    from kafka_es_ray.query.parent_join import run_has_child_inner_hits

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_pjidx_")
    try:
        cfg = _parent_join_index(sf_dir, idx)
        out = run_has_child_inner_hits(
            idx,
            {"kw": [("l_returnflag", "R")], "range": [("l_quantity", 30.0, None)]},
            n_hits=3, cfg=cfg,
        ).to_pandas()
        return out.sort_values(["key", "inner_rank"]).reset_index(drop=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


_HAS_CHILD_INNER_SQL = (
    "WITH " + _CHILD_DOCS_SQL + """
, hits AS (
  SELECT 'O' || CAST(l_orderkey AS VARCHAR) AS key, c.key AS child_key,
         row_number() OVER (
           PARTITION BY l_orderkey ORDER BY c.key ASC
         ) AS inner_rank
  FROM child_docs c
  WHERE l_returnflag = 'R' AND l_quantity >= 30
)
SELECT key, child_key, inner_rank::BIGINT AS inner_rank
FROM hits WHERE inner_rank <= 3 ORDER BY 1, 3
"""
)


def _q_nested_topk(sf_dir: str):
    """ES `nested` query with inner_hits (the Lucene block-join layout:
    nested objects = co-located child rows, routing = root key): BM25 of
    "line r f" over the lineitem nested docs, score_mode=avg combines
    each order's matching children, top-10 orders with up to 3 inner
    hits each.  Global stats follow the engine convention (N/avgdl over
    ALL docs — roots included; exact global df), replayed verbatim by
    the SQL oracle."""
    import shutil
    import tempfile

    from kafka_es_ray.query.parent_join import run_nested

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_nstidx_")
    try:
        cfg = _parent_join_index(sf_dir, idx)
        return run_nested(
            idx, "line r f", score_mode="avg", k=10, inner_n=3, cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


_NESTED_SQL = """
WITH child_docs AS (
  SELECT l_orderkey, l_returnflag, l_linestatus,
         'L' || substr(md5(
             CAST(l_orderkey AS VARCHAR) || '-' ||
             CAST(l_linenumber AS VARCHAR) || '-' ||
             l_returnflag || l_linestatus ||
             CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
         ), 1, 12) AS key
  FROM (SELECT DISTINCT l_orderkey, l_linenumber, l_returnflag,
               l_linestatus, l_quantity FROM lineitem)
),
docs AS (
  SELECT 'O' || CAST(o_orderkey AS VARCHAR) AS key,
         'order ' || o_orderstatus AS text, NULL AS root
  FROM orders
  UNION ALL
  SELECT key, 'line ' || l_returnflag || ' ' || l_linestatus AS text,
         'O' || CAST(l_orderkey AS VARCHAR) AS root
  FROM child_docs
),
dl AS (SELECT key, len({_TOK})::DOUBLE AS dl FROM docs),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
toks AS (SELECT key, unnest({_TOK}) AS term FROM docs),
tf AS (SELECT key, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
q AS (SELECT unnest(['line', 'r', 'f']) AS term),
cs AS (
  SELECT d2.root, tf.key AS child_key,
         sum(
           ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
         ) AS raw
  FROM q JOIN tf USING (term) JOIN df USING (term)
  JOIN dl ON dl.key = tf.key
  JOIN docs d2 ON d2.key = tf.key
  CROSS JOIN stats s
  WHERE d2.root IS NOT NULL
  GROUP BY 1, 2
),
roots AS (
  SELECT root AS key, round(avg(raw), 6) AS score,
         count(*)::BIGINT AS n_matched
  FROM cs GROUP BY 1
),
topk AS (
  SELECT key, score, n_matched,
         row_number() OVER (ORDER BY score DESC, key ASC) AS rank
  FROM roots
),
ih AS (
  SELECT root AS key, child_key, round(raw, 6) AS child_score,
         row_number() OVER (
           PARTITION BY root ORDER BY round(raw, 6) DESC, child_key ASC
         ) AS inner_rank
  FROM cs
)
SELECT t.rank::BIGINT AS rank, t.key, t.score, t.n_matched,
       i.inner_rank::BIGINT AS inner_rank, i.child_key, i.child_score
FROM topk t JOIN ih i USING (key)
WHERE t.rank <= 10 AND i.inner_rank <= 3
ORDER BY 1, 5
""".replace("{_TOK}", _TOK)


def _q_parent_terms_agg(sf_dir: str):
    """ES `parent` aggregation (terms sub-agg): o_orderpriority counts
    over orders having >= 1 lineitem matching (l_returnflag='R' AND
    l_quantity>=30) — each parent counted once, shard-local partials."""
    import shutil
    import tempfile

    from kafka_es_ray.query.parent_join import run_parent_terms_agg

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_pjidx_")
    try:
        cfg = _parent_join_index(sf_dir, idx)
        return run_parent_terms_agg(
            idx,
            {"kw": [("l_returnflag", "R")], "range": [("l_quantity", 30.0, None)]},
            "o_orderpriority", cfg=cfg,
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


_PARENT_TERMS_SQL = (
    "WITH " + _CHILD_DOCS_SQL + """
SELECT o_orderpriority AS value, count(*)::BIGINT AS n
FROM orders
WHERE o_orderkey IN (
  SELECT DISTINCT l_orderkey FROM child_docs
  WHERE l_returnflag = 'R' AND l_quantity >= 30)
GROUP BY 1
ORDER BY n DESC, value ASC
"""
)


def _q_msearch_topk(sf_dir: str):
    """ES _msearch: the derived queries submitted as independent JSON
    search bodies, executed as ONE distributed run_queries batch (one
    segment sweep for all bodies) — results identical to per-query
    search, which is what the shared BM25 oracle asserts."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_query_set
    from kafka_es_ray.query.apis import run_msearch
    from kafka_es_ray.query.engine import IndexSearcher

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_msidx_")
    try:
        build_documents_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx))
        queries = queries[queries["text"] != "zzzabsentterm"].reset_index(drop=True)
        bodies = [
            {"query": {"match": {"text": t}}, "size": 10}
            for t in queries["text"]
        ]
        out = run_msearch(bodies, idx).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_field_caps(sf_dir: str):
    """ES _field_caps across two indices with different mappings — the
    conflict case included (n_chars keyword in one, double in the
    other); pure manifest metadata, no segment I/O."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import documents_dataset
    from kafka_es_ray.query.apis import field_caps

    root = tempfile.mkdtemp(prefix="kafka_es_ray_fcidx_")
    try:
        a, b = f"{root}/idx_a", f"{root}/idx_b"
        build_index(
            documents_dataset(sf_dir, extra_cols=("source", "n_chars")), a,
            EngineConfig(num_partitions=2, keyword_cols=("source",),
                         numeric_cols=("n_chars",)),
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        build_index(
            documents_dataset(sf_dir, extra_cols=("n_chars",)), b,
            EngineConfig(num_partitions=2, keyword_cols=("n_chars",)),
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        return field_caps([a, b])
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _q_cat_indices(sf_dir: str):
    """ES _cat/indices over a documents index after deleting every zh
    doc: live count + deleted count are both data-derived, matching the
    SQL oracle's lang split exactly."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.index.incremental import apply_incremental
    from kafka_es_ray.pipelines.fulltext import DOCS_CFG, build_documents_index
    from kafka_es_ray.query.apis import cat_indices

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_catidx_")
    try:
        build_documents_index(sf_dir, idx)
        docs = pd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
        )
        zh = docs[docs["lang"] == "zh"]
        dele = pd.DataFrame(
            {
                # documents index keys are str(doc_id) (fulltext module)
                "key": zh["doc_id"].astype(str),
                "text": None,
                "lang": "zh",
                "op": "delete",
            }
        )
        apply_incremental(idx, dele, DOCS_CFG, key_col="key", seq_col=None)
        out = cat_indices(idx, names=["documents"])
        return out[["index", "docs_count", "docs_deleted"]]
    finally:
        shutil.rmtree(idx, ignore_errors=True)


_CAT_INDICES_SQL = """
SELECT 'documents' AS index,
       count(*) FILTER (lang <> 'zh')::BIGINT AS docs_count,
       count(*) FILTER (lang = 'zh')::BIGINT AS docs_deleted
FROM documents
"""


def _q_pit_search(sf_dir: str):
    """ES point-in-time search: open a PIT, then mutate the index (an
    incremental batch deletes the global top hit and upserts term-stuffed
    new docs); searching WITH the PIT still returns the pre-update
    ranking — which is exactly what the unchanged documents-table SQL
    oracle computes, so parity IS the visibility proof."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.index.incremental import apply_incremental
    from kafka_es_ray.pipelines.fulltext import (
        DOCS_CFG,
        build_documents_index,
        derive_query_set,
    )
    from kafka_es_ray.query.engine import IndexSearcher, open_pit, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_pitidx_")
    try:
        build_documents_index(sf_dir, idx)
        searcher = IndexSearcher(idx)
        queries = derive_query_set(searcher)
        queries = queries[queries["text"] != "zzzabsentterm"].reset_index(drop=True)
        pit = open_pit(idx)
        # post-PIT mutation: delete query 0's current #1 doc and upsert
        # docs stuffed with the query terms (would dominate every top-10)
        top_key = searcher.search(queries["text"].iloc[0], k=1)["key"].iloc[0]
        stuffing = " ".join(" ".join(queries["text"]) for _ in range(5))
        upd = pd.DataFrame(
            {
                "key": [str(top_key)] + [f"pitnew{i}" for i in range(3)],
                "text": [None] + [stuffing] * 3,
                "lang": "en",
                "op": ["delete", "index", "index", "index"],
            }
        )
        apply_incremental(idx, upd, DOCS_CFG, key_col="key", seq_col=None)
        out = run_queries(queries, idx, DOCS_CFG, pit=pit).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_constant_score(sf_dir: str):
    """ES constant_score: filter-context match, score = boost (1.5) for
    every matching doc; all scores tie so the top-k is the k smallest
    matching doc_ids — shards emit only their first k match ids."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_csidx_")
    try:
        build_documents_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx))
        queries = queries[queries["text"] != "zzzabsentterm"].assign(
            type="constant_score", boost=1.5
        )
        out = run_queries(queries, idx).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_boosting(sf_dir: str):
    """ES boosting query: positive = the derived match queries (BM25);
    docs also matching the negative query (the corpus's top-df term) are
    demoted by negative_boost=0.4 — relative order preserved inside the
    demoted set."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import (
        build_documents_index,
        derive_query_set,
        derive_ranked_terms,
    )
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_boostidx_")
    try:
        build_documents_index(sf_dir, idx)
        s = IndexSearcher(idx)
        top = derive_ranked_terms(s, 1)
        queries = derive_query_set(s)
        queries = queries[queries["text"] != "zzzabsentterm"].assign(
            type="boosting", negative=top[0], negative_boost=0.4
        )
        out = run_queries(queries, idx).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_terms_set(sf_dir: str):
    """ES terms_set query: docs matching >= msm of the given terms,
    scored as the sum of the matched terms' BM25 (a bool of single-term
    should clauses)."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_tsidx_")
    try:
        build_documents_index(sf_dir, idx)
        t = derive_ranked_terms(IndexSearcher(idx), 8)
        queries = pd.DataFrame(
            {
                "query_id": np.arange(4, dtype=np.int64),
                "type": "terms_set",
                "text": [
                    " ".join(t[0:5]),
                    " ".join(t[1:6]),
                    " ".join(t[3:8]),
                    " ".join(t[4:8]),
                ],
                "msm": [3, 2, 4, 2],
                "k": np.int32(10),
            }
        )
        out = run_queries(queries, idx).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_match_bool_prefix(sf_dir: str):
    """ES match_bool_prefix: the final token matches as a prefix scoring
    1.0 per doc (constant_score multi-term rewrite), the complete tokens
    score BM25; per-doc score = round6(sum)."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_mbpidx_")
    try:
        build_documents_index(sf_dir, idx)
        t = derive_ranked_terms(IndexSearcher(idx), 8)
        queries = pd.DataFrame(
            {
                "query_id": np.arange(4, dtype=np.int64),
                "type": "match_bool_prefix",
                # rest terms + the NEXT rank's 3-char prefix as last token
                "text": [
                    f"{t[0]} {t[1][:3]}",
                    f"{t[1]} {t[2]} {t[3][:3]}",
                    f"{t[3]} {t[4]} {t[5]} {t[6][:3]}",
                    f"{t[6]} {t[7]} {t[0][:3]}",
                ],
                "k": np.int32(10),
            }
        )
        out = run_queries(queries, idx).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_simple_query_string(sf_dir: str):
    """ES simple_query_string: +term = must, -term = must_not, bare =
    should (default_operator=or) — parsed then executed on the bool
    path; msm = 1 when no must clause (the ES bool default)."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_ranked_terms
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_sqsidx_")
    try:
        build_documents_index(sf_dir, idx)
        t = derive_ranked_terms(IndexSearcher(idx), 8)
        queries = pd.DataFrame(
            {
                "query_id": np.arange(4, dtype=np.int64),
                "type": "simple_query_string",
                "text": [
                    f"+{t[1]} {t[3]} {t[4]} -{t[0]}",
                    f"{t[2]} {t[4]}",
                    f"+{t[0]} +{t[5]}",
                    f"{t[6]} {t[7]} -{t[1]}",
                ],
                "k": np.int32(10),
            }
        )
        out = run_queries(queries, idx).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_multi_index_topk(sf_dir: str):
    """ES multi-index search (/idx_even,idx_odd/_search): the documents
    corpus split by doc_id parity into TWO indexes, searched together —
    global df/N/avgdl are summed across indexes, so the ranking is
    EXACTLY the combined single-index ranking (the oracle); index_id is
    the ES _index field."""
    import shutil
    import tempfile

    import pandas as pd
    import pyarrow as pa

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    root = tempfile.mkdtemp(prefix="kafka_es_ray_midx_")
    try:
        cfg = EngineConfig(num_partitions=4)
        dirs = []
        for i, want_even in enumerate((True, False)):
            def split(batch: pa.Table, we=want_even) -> pa.Table:
                import pyarrow.compute as pc

                even = pc.equal(pc.bit_wise_and(batch.column("doc_id"), 1), 0)
                return batch.filter(even if we else pc.invert(even))

            d = f"{root}/i{i}"
            build_index(
                documents_dataset(sf_dir).map_batches(split, batch_format="pyarrow"),
                d, cfg,
                key_col="key", lang_col="lang", html_col=None, ts_col=None,
                id_col="doc_id",
            )
            dirs.append(d)
        # query derivation over the UNION dictionary (df summed across
        # both indexes — same rule as derive_ranked_terms)
        df_map: dict[str, int] = {}
        for d in dirs:
            for s in IndexSearcher(d, cfg).segments:
                for t, c in zip(s.terms, s.df):
                    df_map[t] = df_map.get(t, 0) + int(c)
        top = [t for t, _ in sorted(df_map.items(), key=lambda kv: (-kv[1], kv[0]))[:8]]
        queries = pd.DataFrame(
            {
                "query_id": np.arange(4, dtype=np.int64),
                "text": [top[0], " ".join(top[1:3]), " ".join(top[3:6]), " ".join(top[6:8])],
            }
        )
        out = run_queries(queries, dirs, cfg).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score", "index_id"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _q_indices_boost_topk(sf_dir: str):
    """ES indices_boost on multi-index search: the parity-split corpus
    searched with the even index boosted x2 — per-index score scaling
    before the per-segment cut, so the cross-index merge is exact (x2 of
    a 6dp score is exactly 6dp: no rounding boundary in the oracle)."""
    import shutil
    import tempfile

    import pandas as pd
    import pyarrow as pa

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    root = tempfile.mkdtemp(prefix="kafka_es_ray_ibidx_")
    try:
        cfg = EngineConfig(num_partitions=4)
        dirs = []
        for i, want_even in enumerate((True, False)):
            def split(batch: pa.Table, we=want_even) -> pa.Table:
                import pyarrow.compute as pc

                even = pc.equal(pc.bit_wise_and(batch.column("doc_id"), 1), 0)
                return batch.filter(even if we else pc.invert(even))

            d = f"{root}/i{i}"
            build_index(
                documents_dataset(sf_dir).map_batches(split, batch_format="pyarrow"),
                d, cfg,
                key_col="key", lang_col="lang", html_col=None, ts_col=None,
                id_col="doc_id",
            )
            dirs.append(d)
        df_map: dict[str, int] = {}
        for d in dirs:
            for s in IndexSearcher(d, cfg).segments:
                for t, c in zip(s.terms, s.df):
                    df_map[t] = df_map.get(t, 0) + int(c)
        top = [t for t, _ in sorted(df_map.items(), key=lambda kv: (-kv[1], kv[0]))[:8]]
        queries = pd.DataFrame(
            {
                "query_id": np.arange(4, dtype=np.int64),
                "text": [top[0], " ".join(top[1:3]), " ".join(top[3:6]), " ".join(top[6:8])],
            }
        )
        out = run_queries(queries, dirs, cfg, indices_boost=[2.0, 1.0]).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score", "index_id"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# indices_boost: even docs (index 0) x2 before ranking; global stats
# still summed across indexes (the multi-index contract)
_INDICES_BOOST_SQL = _BM25_SQL.replace(
    """topk AS (
  SELECT query_id, doc_id, round(raw_score, 6) AS score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(raw_score, 6) DESC, doc_id ASC
         ) AS rank
  FROM scores
)""",
    """topk AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rank
  FROM (
    SELECT query_id, doc_id,
           CASE WHEN doc_id % 2 = 0
                THEN round(raw_score, 6) * 2 ELSE round(raw_score, 6)
           END AS score
    FROM scores)
)""",
).replace(
    "SELECT query_id, rank::BIGINT AS rank, doc_id, score",
    "SELECT query_id, rank::BIGINT AS rank, doc_id, score,"
    " (doc_id % 2)::BIGINT AS index_id",
)
assert "CASE WHEN doc_id % 2 = 0" in _INDICES_BOOST_SQL


def _q_phrase_prefix_count(sf_dir: str):
    """ES match_phrase_prefix (autocomplete) count: the corpus's top
    bigram with the second word truncated to 3 chars — positions-indexed
    adjacency + prefix expansion, distributed MatchSetStage path."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.pipelines.fulltext import build_documents_index
    from kafka_es_ray.pipelines.text_ops import top_bigram
    from kafka_es_ray.query.engine import run_counts
    from kafka_es_ray.sources.parquet import read_table

    w1, w2, _ = top_bigram(read_table(sf_dir, "documents", columns=["text"]))
    idx = tempfile.mkdtemp(prefix="kafka_es_ray_ppidx_")
    try:
        cfg = EngineConfig(num_partitions=8, index_positions=True)
        build_documents_index(sf_dir, idx, cfg)
        queries = pd.DataFrame(
            {"query_id": np.array([0], dtype=np.int64), "phrase_prefix": [f"{w1} {w2[:3]}"]}
        )
        return run_counts(queries, idx, cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_match_must_not(sf_dir: str):
    """ES bool must_not: derived queries with the corpus's top-df term
    excluded (docs containing it drop out of the ranking)."""
    import shutil
    import tempfile

    import pandas as pd

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_mnidx_")
    try:
        build_documents_index(sf_dir, idx)
        searcher = IndexSearcher(idx)
        queries = derive_query_set(searcher)
        queries = queries[queries["text"] != "zzzabsentterm"]
        top_term = queries["text"].iloc[0]  # r=1 term
        out = []
        for qid, text in zip(queries["query_id"], queries["text"]):
            res = searcher.search(text, k=10, must_not=top_term)
            res.insert(0, "query_id", np.int64(qid))
            out.append(res)
        return pd.concat(out, ignore_index=True)[
            ["query_id", "rank", "doc_id", "score"]
        ]
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_match_count(sf_dir: str):
    """ES _count API analog over the documents index: number of live docs
    matching each derived query (operator=or, no top-k cap) — runs via
    the DISTRIBUTED MatchSetStage path (segments as the Dataset, plans
    broadcast; no actor loads the whole index)."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_counts

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_cntidx_")
    try:
        build_documents_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx))
        queries = queries[queries["text"] != "zzzabsentterm"]
        out = run_counts(queries, idx)
        return out[out["n_matching"] > 0].reset_index(drop=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_match_lang_agg(sf_dir: str):
    """ES terms-aggregation analog: lang buckets over each derived
    query's match set (query_id, value, n_docs) — distributed
    MatchSetStage path."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import build_documents_index, derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_agg_terms

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_aggidx_")
    try:
        build_documents_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_agg_terms(queries, idx, field="lang")[["query_id", "value", "n_docs"]]
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_terms_key_order_agg(sf_dir: str):
    """ES terms aggregation with order {"_key": "asc"}: source buckets
    per derived query's match set, size cut in KEY order (not count
    order — the ES order param changing which buckets survive)."""
    import shutil

    from kafka_es_ray.query.engine import run_agg_terms

    idx, cfg, queries = _agg_index_build(sf_dir, keyword=("source",))
    try:
        return run_agg_terms(
            queries, idx, field="source", size=3, order="key", cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


_TERMS_KEY_ORDER_SQL = _AGG_VALS_CTE + """
, b AS (
  SELECT query_id, source AS value, count(*)::BIGINT AS n_docs,
         row_number() OVER (PARTITION BY query_id ORDER BY source ASC) AS rn
  FROM vals GROUP BY 1, 2
)
SELECT query_id, value, n_docs FROM b WHERE rn <= 3 ORDER BY 1, 2
"""


def _q_match_source_agg(sf_dir: str):
    """Terms aggregation over an ARBITRARY keyword field (cfg.keyword_cols
    generalization of the lang bucket): source buckets per derived query's
    match set — distributed MatchSetStage path."""
    import shutil
    import tempfile

    import pyarrow as pa

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_agg_terms
    from kafka_es_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])

    def add_key(batch: pa.Table) -> pa.Table:
        return batch.append_column("key", batch.column("doc_id").cast(pa.string()))

    cfg = EngineConfig(num_partitions=8, keyword_cols=("source",))
    idx = tempfile.mkdtemp(prefix="kafka_es_ray_srcagg_")
    try:
        build_index(
            ds.map_batches(add_key, batch_format="pyarrow"), idx, cfg,
            key_col="key", text_col="text", lang_col="lang",
            html_col=None, ts_col=None, id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_agg_terms(queries, idx, field="source", cfg=cfg)[
            ["query_id", "value", "n_docs"]
        ]
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_terms_include_agg(sf_dir: str):
    """ES terms aggregation include/exclude value filters: source
    buckets kept by the anchored include regex src[0-4] minus the
    exclude regex src3, applied before ordering (ES semantics)."""
    import shutil
    import tempfile

    import pyarrow as pa

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_agg_terms
    from kafka_es_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])

    def add_key(batch: pa.Table) -> pa.Table:
        return batch.append_column("key", batch.column("doc_id").cast(pa.string()))

    cfg = EngineConfig(num_partitions=8, keyword_cols=("source",))
    idx = tempfile.mkdtemp(prefix="kafka_es_ray_incagg_")
    try:
        build_index(
            ds.map_batches(add_key, batch_format="pyarrow"), idx, cfg,
            key_col="key", text_col="text", lang_col="lang",
            html_col=None, ts_col=None, id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_agg_terms(
            queries, idx, field="source", cfg=cfg,
            include=r"src[0-4]", exclude=r"src3",
        )[["query_id", "value", "n_docs"]]
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_terms_partition_agg(sf_dir: str):
    """ES terms-agg partitioning (include: {partition, num_partitions}):
    page 1 of 3 over the source value space — values kept iff
    md5_number_lower(value) % 3 == 1 (the engine-wide sampling hash
    contract), counts unchanged."""
    import shutil
    import tempfile

    import pyarrow as pa

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_agg_terms
    from kafka_es_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])

    def add_key(batch: pa.Table) -> pa.Table:
        return batch.append_column("key", batch.column("doc_id").cast(pa.string()))

    cfg = EngineConfig(num_partitions=8, keyword_cols=("source",))
    idx = tempfile.mkdtemp(prefix="kafka_es_ray_tpaidx_")
    try:
        build_index(
            ds.map_batches(add_key, batch_format="pyarrow"), idx, cfg,
            key_col="key", text_col="text", lang_col="lang",
            html_col=None, ts_col=None, id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_agg_terms(
            queries, idx, field="source", cfg=cfg, partition=(1, 3),
        )[["query_id", "value", "n_docs"]]
    finally:
        shutil.rmtree(idx, ignore_errors=True)


_TERMS_PARTITION_SQL = _MATCHES_CTE + """
SELECT m.query_id, d.source AS value, count(*)::BIGINT AS n_docs
FROM matches m JOIN documents d USING (doc_id)
WHERE md5_number_lower(d.source) % 3 = 1
GROUP BY 1, 2 ORDER BY 1, 2
"""


def _q_histogram_offset_agg(sf_dir: str):
    """ES histogram with offset=37 and min_doc_count=0: bucket keys are
    floor((n_chars-37)/100)*100+37 (shard-side, partials stay mergeable)
    and the driver reduce emits the empty buckets between each query's
    min and max observed keys (the ES gap-filling contract)."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_agg_histogram

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_hofidx_")
    try:
        cfg = EngineConfig(num_partitions=8, numeric_cols=("n_chars",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("n_chars",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_agg_histogram(
            queries, idx, "n_chars", 100.0, cfg=cfg, offset=37.0,
            min_doc_count=0,
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_terms_numeric_agg(sf_dir: str):
    """ES terms aggregation over a NUMERIC field (n_chars): per-value
    doc counts from the per-value partial sweep, ES bucket order, top-15
    cut per query."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_agg_terms_numeric

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_tnidx_")
    try:
        cfg = EngineConfig(num_partitions=8, numeric_cols=("n_chars",))
        build_index(
            documents_dataset(sf_dir, extra_cols=("n_chars",)), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_agg_terms_numeric(queries, idx, "n_chars", size=15, cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


_TERMS_NUMERIC_SQL = _MATCHES_CTE + """
, buckets AS (
  SELECT m.query_id, d.n_chars::DOUBLE AS value, count(*)::BIGINT AS n_docs
  FROM matches m JOIN documents d USING (doc_id)
  WHERE d.n_chars IS NOT NULL
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY n_docs DESC, value ASC) AS rn
  FROM buckets
)
SELECT query_id, value, n_docs FROM ranked WHERE rn <= 15
ORDER BY 1, n_docs DESC, value ASC
"""


def _q_mget_docs(sf_dir: str):
    """ES _mget analog (distributed MgetStage path): point lookups by
    external key with found/missing flags."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import build_documents_index
    from kafka_es_ray.query.engine import run_mget

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_mgetidx_")
    try:
        build_documents_index(sf_dir, idx)
        keys = ["5", "50", "123", "404", "999999999"]
        return run_mget(keys, idx)[["key", "doc_id", "lang", "found"]]
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_analyze_api(sf_dir: str):
    """ES _analyze API analog: token stream (term + 0-based position)
    of the ascii_v1 analyzer for the first three documents — the
    analyzer-introspection surface the CLI `analyze` subcommand exposes,
    as a table the tokenizer ≡ DuckDB contract can replay."""
    import pandas as pd

    from kafka_es_ray.functions.tokenizer import get_analyzer
    from kafka_es_ray.sources.parquet import read_table

    docs = (
        read_table(sf_dir, "documents", columns=["doc_id", "text"])
        .to_pandas()
        .sort_values("doc_id")
        .head(3)
    )
    an = get_analyzer("en")
    toks = an.tokenize_series(docs["text"])
    rows = []
    for did, tt in zip(docs["doc_id"], toks):
        for p, t in enumerate(tt):
            rows.append((np.int64(did), np.int64(p), t))
    return pd.DataFrame(rows, columns=["doc_id", "position", "token"]).astype(
        {"doc_id": "int64", "position": "int64"}
    )


def _q_mget_fields(sf_dir: str):
    """ES _mget with mapped-field retrieval: point lookups returning
    keyword (source) and numeric (n_chars) docstore columns per hit —
    the docvalue form of _mget; missing keys keep found=false/None."""
    import shutil
    import tempfile

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import documents_dataset
    from kafka_es_ray.query.engine import run_mget

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_mgfidx_")
    try:
        cfg = EngineConfig(
            num_partitions=8, keyword_cols=("source",), numeric_cols=("n_chars",)
        )
        build_index(
            documents_dataset(sf_dir, extra_cols=("source", "n_chars")), idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        keys = ["0", "7", "42", "999999999"]
        out = run_mget(keys, idx, cfg, fetch_fields=["source", "n_chars"])
        return out[["key", "doc_id", "lang", "found", "source", "n_chars"]]
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_lineitem_agg(sf_dir: str):
    from kafka_es_ray.pipelines.relational import lineitem_agg
    from kafka_es_ray.sources.parquet import read_table

    return lineitem_agg(
        read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
    )


def _q_topk_orders(sf_dir: str):
    from kafka_es_ray.pipelines.relational import topk_orders
    from kafka_es_ray.sources.parquet import read_table

    return topk_orders(read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"]), k=10)


def _q_ngram_jaccard(sf_dir: str):
    from kafka_es_ray.pipelines.dedup_ops import ngram_jaccard_pairs
    from kafka_es_ray.sources.parquet import read_table

    return ngram_jaccard_pairs(read_table(sf_dir, "documents", columns=["doc_id", "text"]), threshold=0.01)


def _q_dedup_clusters(sf_dir: str):
    from kafka_es_ray.pipelines.dedup_ops import dedup_clusters
    from kafka_es_ray.sources.parquet import read_table

    return dedup_clusters(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]), threshold=0.2
    )


def _q_tfidf_top_terms(sf_dir: str):
    """TF-IDF keyword extraction: top-5 terms per document by
    round6(tf * ln(N/df)) — tf/df co-partitioned joins via bucketed
    exchanges, no driver-side vocabulary."""
    from kafka_es_ray.pipelines.text_ops import tfidf_top_terms
    from kafka_es_ray.sources.parquet import read_table

    return tfidf_top_terms(read_table(sf_dir, "documents", columns=["doc_id", "text"]), k=5)


def _q_mix_epochs(sf_dir: str):
    """Dataset mixing with repetition: src0 up-weighted 2.3x (2 full
    epochs + hash-decided 0.3 fractional epoch), src1 down-sampled 0.4x,
    everything else 1.0 — streaming flat-map, membership a pure function
    of (id, epoch)."""
    from kafka_es_ray.pipelines.sampling import mix_epochs
    from kafka_es_ray.sources.parquet import read_table

    out = mix_epochs(
        read_table(sf_dir, "documents", columns=["doc_id", "source"]),
        {"src0": 2.3, "src1": 0.4},
    )
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    if len(out) == 0:
        import pandas as pd

        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "source": pd.Series([], dtype=object),
             "epoch": pd.Series([], dtype="int64")}
        )
    return (
        out[["doc_id", "source", "epoch"]]
        .sort_values(["doc_id", "epoch"])
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "epoch": "int64"})
    )


def _q_pack_sequences(sf_dir: str):
    """Training-sequence packing (concatenate-then-split at capacity
    256): per-doc global start offset + first/last sequence window via
    the distributed prefix-sum (range partials -> driver offsets ->
    broadcast), no doc rows shuffled."""
    from kafka_es_ray.pipelines.text_ops import pack_training_sequences
    from kafka_es_ray.sources.parquet import read_table

    out = pack_training_sequences(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]), capacity=256
    )
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    if len(out) == 0:  # 0-row Dataset.to_pandas drops columns (rule 8b)
        import pandas as pd

        return pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("doc_id", "n_tokens", "start_offset", "first_seq", "last_seq")}
        )
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_quality_classifier(sf_dir: str):
    """Classifier-based document filter (frozen-weight sigmoid over four
    vectorized text features — the fastText/DCLM filtering shape): one
    streaming pass, keep = quality >= 0.5."""
    from kafka_es_ray.pipelines.text_ops import quality_classifier
    from kafka_es_ray.sources.parquet import read_table

    out = quality_classifier(
        read_table(sf_dir, "documents", columns=["doc_id", "text"])
    )
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    if len(out) == 0:  # rule 8b
        import pandas as pd

        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "n_tokens": pd.Series([], dtype="int64"),
             "quality": pd.Series([], dtype="float64"),
             "keep": pd.Series([], dtype=bool)}
        )
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_lm_quality_buckets(sf_dir: str):
    """CCNet-style perplexity bucketing: unigram-LM doc scores cut into
    head/middle/tail by fixed configuration cutoffs."""
    from kafka_es_ray.pipelines.text_ops import lm_quality_buckets
    from kafka_es_ray.sources.parquet import read_table

    out = lm_quality_buckets(
        read_table(sf_dir, "documents", columns=["doc_id", "text"])
    )
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    if len(out) == 0:  # rule 8b
        import pandas as pd

        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "n_tokens": pd.Series([], dtype="int64"),
             "lm_logprob": pd.Series([], dtype="float64"),
             "bucket": pd.Series([], dtype=object)}
        )
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_embedding_pca(sf_dir: str):
    """Distributed PCA over the embeddings table: one moment-partial
    pass + driver eigh (d x d, never rows); returns the top-4
    components as (component, dim, loading) rows plus each component's
    explained variance — rows-only (eigendecomposition is not
    SQL-expressible; correctness pinned by the numpy-parity pytest)."""
    import pandas as pd

    from kafka_es_ray.pipelines.ann import embedding_pca
    from kafka_es_ray.sources.parquet import read_table

    comps, ev, _ = embedding_pca(
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]), 4
    )
    k, d = comps.shape
    return pd.DataFrame(
        {
            "component": np.repeat(np.arange(k, dtype=np.int64), d),
            "dim": np.tile(np.arange(d, dtype=np.int64), k),
            "loading": np.floor(comps.ravel() * 1e6 + 0.5) / 1e6,
            "explained_variance": np.repeat(
                np.floor(ev * 1e6 + 0.5) / 1e6, d
            ),
        }
    )


def _q_top_quality_fraction(sf_dir: str):
    """Corpus curation selection: keep the best 30% by the frozen-weight
    quality classifier — exact distributed threshold from one bounded
    per-round6-value count exchange, smallest-doc_id-first at the tied
    cutoff value."""
    from kafka_es_ray.pipelines.text_ops import top_quality_fraction
    from kafka_es_ray.sources.parquet import read_table

    return top_quality_fraction(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]), frac=0.3
    )


def _q_lm_score(sf_dir: str):
    """Unigram-LM quality scoring: per-doc mean token log-likelihood
    under the corpus's own MLE unigram model — tf⋈count co-partitioned
    bucketed exchanges, no driver vocabulary."""
    from kafka_es_ray.pipelines.text_ops import lm_score
    from kafka_es_ray.sources.parquet import read_table

    out = lm_score(read_table(sf_dir, "documents", columns=["doc_id", "text"]))
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    if len(out) == 0:  # 0-row Dataset.to_pandas drops columns (rule 8b)
        import pandas as pd

        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "n_tokens": pd.Series([], dtype="int64"),
             "lm_logprob": pd.Series([], dtype="float64")}
        )
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_doc_token_counts(sf_dir: str):
    from kafka_es_ray.pipelines.text_ops import doc_token_counts
    from kafka_es_ray.sources.parquet import read_table

    return doc_token_counts(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


def _q_term_df(sf_dir: str):
    from kafka_es_ray.pipelines.text_ops import term_df
    from kafka_es_ray.sources.parquet import read_table

    return term_df(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


def _q_exact_dedup(sf_dir: str):
    from kafka_es_ray.pipelines.dedup_ops import exact_dedup
    from kafka_es_ray.sources.parquet import read_table

    return exact_dedup(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


def _url_docs(sf_dir: str, extra_cols: tuple = ()):
    """doc_id + a deterministic derived URL exercising every canon_v1
    rule (mixed-case host, default port, trailing slash, tracking
    params, fragments) — exact string construction on both engines.
    ``extra_cols``: passthrough documents columns (e.g. n_chars)."""
    import pandas as _pd

    from kafka_es_ray.sources.parquet import read_table

    def add_url(batch: _pd.DataFrame) -> _pd.DataFrame:
        i = batch["doc_id"].astype(np.int64)
        url = (
            "https://ExAmple" + (i % 5).astype(str) + ".COM"
            + np.where(i % 4 == 0, ":443", "")
            + "/Page/" + (i % 100).astype(str)
            + np.where(i % 3 == 0, "/", "")
            + np.where(
                i % 2 == 0,
                "?utm_source=feed&ref=" + (i % 3).astype(str),
                np.where(i % 7 == 0, "?gclid=x", ""),
            )
            + np.where(i % 6 == 0, "#s" + (i % 3).astype(str), "")
        )
        out = _pd.DataFrame({"doc_id": i, "url": url})
        for c in extra_cols:
            out[c] = batch[c].to_numpy()
        return out

    return read_table(
        sf_dir, "documents", columns=["doc_id", *extra_cols]
    ).map_batches(add_url, batch_format="pandas")


def _q_canonical_urls(sf_dir: str):
    """URL canonicalization (frozen canon_v1): lowercase scheme+host,
    strip fragment / default port / tracking params / trailing slash —
    a stateless vectorized map, no shuffle."""
    from kafka_es_ray.pipelines.webtext import canonicalize_urls

    out = canonicalize_urls(_url_docs(sf_dir)).to_pandas()
    return out[["doc_id", "canon_url"]].sort_values("doc_id").reset_index(drop=True)


def _q_url_dedup(sf_dir: str):
    """Canonical-URL exact dedup: one survivor (min doc_id) per distinct
    canonical URL — the crawl-side key-normalized dedup; shuffle moves
    only (hash, id) pairs."""
    from kafka_es_ray.pipelines.webtext import canonical_url_dedup

    out = canonical_url_dedup(_url_docs(sf_dir)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_host_quality_filter(sf_dir: str):
    """Host-level quality curation (judge the domain, drop its pages):
    hosts with mean n_chars < 300 removed with every doc — failing-host
    blocklist computed via exact integer sums in one bucketed exchange,
    broadcast into a streaming filter."""
    from kafka_es_ray.pipelines.webtext import host_quality_filter

    out = host_quality_filter(
        _url_docs(sf_dir, extra_cols=("n_chars",)), min_avg=300
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_url_quality(sf_dir: str):
    """URL spam signals over the derived URLs: subdomain/path depth,
    integer milli digit-fraction of the host, query length, rule-count
    spam score — one vectorized pass, exact integer arithmetic."""
    from kafka_es_ray.pipelines.webtext import url_quality

    out = url_quality(_url_docs(sf_dir)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_domain_blocklist_counts(sf_dir: str):
    """Domain blocklist filter + per-host doc counts: blocked hosts
    dropped via a broadcast set, per-batch combiner partials summed in
    one bucketed exchange."""
    from kafka_es_ray.pipelines.webtext import domain_counts

    out = domain_counts(
        _url_docs(sf_dir), blocked=("example1.com", "example3.com")
    ).to_pandas()
    return out.sort_values("host").reset_index(drop=True)


def _q_lww_events(sf_dir: str):
    from kafka_es_ray.pipelines.dedup_ops import last_write_wins
    from kafka_es_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])
    out = last_write_wins(ds, "user_id", ["ts", "event_id"])
    return out.select_columns(["user_id", "event_id", "event_type", "value"])


def _q_simulate_pipeline(sf_dir: str):
    """ES _ingest/pipeline/_simulate: the compiled processor chain over
    three inline docs with per-doc error isolation — doc 2's convert
    failure yields ok=false + NULL fields while docs 0-1 transform."""
    from kafka_es_ray.stages.ingest import simulate_pipeline

    procs = [
        {"gsub": {"field": "v", "pattern": "[0-9]+", "replacement": "#"}},
        {"set": {"field": "pipeline", "value": "v1"}},
        {"convert": {"field": "n", "type": "integer"}},
    ]
    docs = [
        {"v": "abc123", "n": "42"},
        {"v": "x9", "n": "7"},
        {"v": "zz", "n": "oops"},
    ]
    return simulate_pipeline(procs, docs)


_SIMULATE_SQL = """
WITH docs(slot, v, n) AS (
  VALUES (0, 'abc123', '42'), (1, 'x9', '7'), (2, 'zz', 'oops')
),
flagged AS (
  SELECT slot, v, n, regexp_full_match(n, '[0-9]+') AS ok FROM docs
)
SELECT slot::BIGINT AS slot, ok,
       CASE WHEN ok THEN regexp_replace(v, '[0-9]+', '#', 'g') END AS v,
       CASE WHEN ok THEN CAST(n AS DOUBLE) END AS n,
       CASE WHEN ok THEN 'v1' END AS pipeline
FROM flagged ORDER BY 1
"""


def _q_ingest_pipeline(sf_dir: str):
    """ES ingest pipeline (?pipeline= on bulk): a whitelisted processor
    chain — rename value->amount, set a constant, uppercase event_type,
    gsub digit runs in props, convert user_id to string — compiled once
    and run as one streaming map_batches stage over the events table."""
    from kafka_es_ray.sources.parquet import read_table
    from kafka_es_ray.stages.ingest import apply_ingest_pipeline

    ds = read_table(
        sf_dir, "events",
        columns=["event_id", "user_id", "event_type", "value", "props"],
    )
    out = apply_ingest_pipeline(
        ds,
        [
            {"rename": {"field": "value", "target_field": "amount"}},
            {"set": {"field": "pipeline", "value": "v1"}},
            {"uppercase": {"field": "event_type"}},
            {"gsub": {"field": "props", "pattern": "[0-9]+", "replacement": "#"}},
            {"convert": {"field": "user_id", "type": "string"}},
        ],
    )
    return out


_INGEST_SQL = """
SELECT event_id,
       CAST(user_id AS VARCHAR) AS user_id,
       upper(event_type) AS event_type,
       value AS amount,
       regexp_replace(props, '[0-9]+', '#', 'g') AS props,
       'v1' AS pipeline
FROM events
ORDER BY event_id
"""


def _q_sessionize(sf_dir: str):
    """Gap-based sessionization (30-min gap) of the events log — one
    bucketed per-user exchange, sessions split by cumsum inside buckets."""
    from kafka_es_ray.pipelines.relational import sessionize_events
    from kafka_es_ray.sources.parquet import read_table

    return sessionize_events(
        read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    )


def _q_frequent_pairs(sf_dir: str):
    """ES frequent_item_sets (size-2 subset): token pairs co-occurring
    in >= 60 documents, top-20 by (support desc, pair asc) — Apriori
    df-prune pass + one bucketed pair exchange."""
    from kafka_es_ray.pipelines.text_ops import frequent_token_pairs
    from kafka_es_ray.sources.parquet import read_table

    return frequent_token_pairs(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]),
        min_support=60, k=20,
    )


_FREQ_PAIRS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
tf AS (SELECT DISTINCT doc_id, term FROM toks),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
freq AS (SELECT term FROM df WHERE df >= 60),
pairs AS (
  SELECT a.term AS t1, b.term AS t2, count(*)::BIGINT AS support
  FROM tf a
  JOIN tf b ON a.doc_id = b.doc_id AND a.term < b.term
  JOIN freq f1 ON f1.term = a.term
  JOIN freq f2 ON f2.term = b.term
  GROUP BY 1, 2 HAVING count(*) >= 60
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY support DESC, t1 ASC, t2 ASC) AS rank
  FROM pairs
)
SELECT rank::BIGINT AS rank, t1, t2, support
FROM ranked WHERE rank <= 20 ORDER BY 1
""".replace("{_TOK}", _TOK)


def _q_bpe_token_counts(sf_dir: str):
    """Trained-BPE token counting (rows-only — the merge loop is not
    SQL-expressible; pytest test_bpe.py pins the algorithm on the
    classic worked example + serial-parity + partition-invariance):
    learn 40 merges on the deterministic 1/7 corpus sample (few enough
    that long words stay split into subwords on this small-vocab
    corpus), then count
    (doc_id, n_tokens, n_bpe_tokens) for every document with the
    memoized distributed encoder."""
    from kafka_es_ray.pipelines.text_ops import bpe_token_counts, bpe_train_sample
    from kafka_es_ray.sources.parquet import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    merges = bpe_train_sample(docs, num_merges=40, sample_mod=7)
    return (
        bpe_token_counts(docs, merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _q_cumulative_cardinality(sf_dir: str):
    """ES cumulative_cardinality pipeline aggregation (exact): running
    distinct users per calendar month of the events log — per-batch
    (value, min-bucket) combiner, one hash-bucketed exchange, driver
    sees only O(months) rows."""
    from kafka_es_ray.pipelines.relational import cumulative_cardinality
    from kafka_es_ray.sources.parquet import read_table

    return cumulative_cardinality(
        read_table(sf_dir, "events", columns=["ts", "user_id"])
    )


_CUM_CARD_SQL = """
WITH m AS (
  SELECT epoch(date_trunc('month', ts))::BIGINT AS bucket_ts, user_id
  FROM events
),
f AS (SELECT user_id, min(bucket_ts) AS fb FROM m GROUP BY 1),
bk AS (SELECT DISTINCT bucket_ts FROM m),
nn AS (SELECT fb AS bucket_ts, count(*)::BIGINT AS n_new FROM f GROUP BY 1)
SELECT bk.bucket_ts, coalesce(nn.n_new, 0)::BIGINT AS n_new,
       (sum(coalesce(nn.n_new, 0)) OVER (ORDER BY bk.bucket_ts))::BIGINT
         AS cum_distinct
FROM bk LEFT JOIN nn USING (bucket_ts) ORDER BY 1
"""


def _q_approx_value_quantiles(sf_dir: str):
    """DDSketch approximate quantiles of events.value (relative-error
    <= ~1%, mergeable, execution-order-deterministic) — rows-only;
    pytest asserts the error bound vs exact (test_sketches)."""
    from kafka_es_ray.pipelines.sketches import approx_quantiles
    from kafka_es_ray.sources.parquet import read_table

    return approx_quantiles(
        read_table(sf_dir, "events", columns=["value"]), "value"
    )


def _q_window_events(sf_dir: str):
    from kafka_es_ray.pipelines.relational import windowed_agg
    from kafka_es_ray.sources.parquet import read_table

    return windowed_agg(read_table(sf_dir, "events", columns=["ts", "event_type", "value"]))


def _q_props_json_agg(sf_dir: str):
    """JSON payload extraction + grouped agg: parse each event's props
    JSON, aggregate the k field per event_type (count / int64-exact sum
    / round6 avg) — per-batch combiner partials, no row-level shuffle."""
    from kafka_es_ray.pipelines.relational import props_json_agg
    from kafka_es_ray.sources.parquet import read_table

    return props_json_agg(
        read_table(sf_dir, "events", columns=["event_type", "props"])
    )


def _q_broadcast_lookup(sf_dir: str):
    import pyarrow.parquet as pq

    from kafka_es_ray.pipelines.relational import broadcast_join_agg
    from kafka_es_ray.sources.parquet import read_table, table_path

    customer = pq.read_table(
        table_path(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    return broadcast_join_agg(orders, customer)


def _q_ann_topk(sf_dir: str):
    import pyarrow.parquet as pq

    from kafka_es_ray.pipelines.ann import cosine_topk
    from kafka_es_ray.sources.parquet import read_table, table_path

    qt = pq.read_table(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    qdf = qt.to_pandas()
    qdf = qdf[qdf["vec_id"] < 3].sort_values("vec_id")
    qm = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return cosine_topk(emb, qdf["vec_id"].to_numpy(), qm, k=10)


def _q_ann_sq8_topk(sf_dir: str):
    """int8 scalar-quantized ANN (4x smaller vector storage/shuffle):
    approximate by design -> rows-only; recall + sim-error bounds
    asserted vs brute force in tests/test_pipelines.py."""
    import pyarrow.parquet as pq

    from kafka_es_ray.pipelines.ann import sq8_cosine_topk
    from kafka_es_ray.sources.parquet import read_table, table_path

    qt = pq.read_table(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    qdf = qt.to_pandas()
    qdf = qdf[qdf["vec_id"] < 3].sort_values("vec_id")
    qm = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return sq8_cosine_topk(emb, qdf["vec_id"].to_numpy(), qm, k=10)


def _q_ann_sq8_rescore_topk(sf_dir: str):
    """SQ8 ANN + ES rescore_vector (oversample=3): int8-quantized
    candidate selection, full-precision re-ranking — the quantized-index
    rescore pattern.  Sims are EXACT cosine, so the oracle is the exact
    top-k SQL (the pytest asserts the oversample covers the exact top-k
    per batch at these scales)."""
    import pyarrow.parquet as pq

    from kafka_es_ray.pipelines.ann import sq8_rescore_topk
    from kafka_es_ray.sources.parquet import read_table, table_path

    qt = pq.read_table(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    qdf = qt.to_pandas()
    qdf = qdf[qdf["vec_id"] < 3].sort_values("vec_id")
    qm = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return sq8_rescore_topk(emb, qdf["vec_id"].to_numpy(), qm, k=10, oversample=3.0)


def _q_ann_pq_rescore_topk(sf_dir: str):
    """Product-quantization ANN + rescore_vector (oversample=8): ADC
    candidate selection over PQ codes (4-16x smaller residency than
    float32 — the memory-scale complement to IVF's candidate pruning),
    full-precision re-ranking.  Sims are EXACT cosine, so the oracle is
    the exact top-k SQL (coverage pytest'd at these scales)."""
    import pyarrow.parquet as pq

    from kafka_es_ray.pipelines.ann import pq_rescore_topk
    from kafka_es_ray.sources.parquet import read_table, table_path

    qt = pq.read_table(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    qdf = qt.to_pandas()
    qdf = qdf[qdf["vec_id"] < 3].sort_values("vec_id")
    qm = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return pq_rescore_topk(
        emb, qdf["vec_id"].to_numpy(), qm, k=10, oversample=8.0, m=16, ksub=256
    )


def _q_ann_pq_topk(sf_dir: str):
    """PQ ADC scale path (codebooks trained on a bounded sample, ADC
    lookup-table scoring over codes): approximate by design -> rows-only;
    recall + determinism asserted vs brute force in tests."""
    import pyarrow.parquet as pq

    from kafka_es_ray.pipelines.ann import pq_cosine_topk
    from kafka_es_ray.sources.parquet import read_table, table_path

    qt = pq.read_table(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    qdf = qt.to_pandas()
    qdf = qdf[qdf["vec_id"] < 3].sort_values("vec_id")
    qm = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return pq_cosine_topk(emb, qdf["vec_id"].to_numpy(), qm, k=10, m=8, ksub=256)



def _q_ann_ivfpq_topk(sf_dir: str):
    """IVF+PQ composed scale path (coarse-list pruning + ADC scoring
    from codes): approximate on both axes -> rows-only; recall asserted
    vs brute force in tests."""
    import pyarrow.parquet as pq

    from kafka_es_ray.pipelines.ann import ivfpq_cosine_topk
    from kafka_es_ray.sources.parquet import read_table, table_path

    qt = pq.read_table(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    qdf = qt.to_pandas()
    qdf = qdf[qdf["vec_id"] < 3].sort_values("vec_id")
    qm = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ivfpq_cosine_topk(
        emb, qdf["vec_id"].to_numpy(), qm, k=10, nlist=16, nprobe=6, m=16
    )


def _q_ann_ivf_topk(sf_dir: str):
    """IVF scale path (spherical-kmeans coarse quantizer, nprobe lists):
    approximate by design -> rows-only; recall asserted vs brute force in
    tests/test_pipelines.py."""
    import pyarrow.parquet as pq

    from kafka_es_ray.pipelines.ann import ivf_cosine_topk
    from kafka_es_ray.sources.parquet import read_table, table_path

    qt = pq.read_table(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    qdf = qt.to_pandas()
    qdf = qdf[qdf["vec_id"] < 3].sort_values("vec_id")
    qm = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ivf_cosine_topk(emb, qdf["vec_id"].to_numpy(), qm, k=10, nlist=32, nprobe=8)


def _q_global_shuffle(sf_dir: str):
    """Deterministic global training shuffle: shuffle_pos = rank in
    ascending (md5('shuf:' || doc_id) % 2^62, doc_id) order — prefix sum
    over hash ranges, one bucketed exchange, driver sees only per-range
    count scalars."""
    from kafka_es_ray.pipelines.sampling import global_shuffle
    from kafka_es_ray.sources.parquet import read_table

    return global_shuffle(read_table(sf_dir, "documents", columns=["doc_id"]))


def _q_line_dedup(sf_dir: str):
    """C4/RefinedWeb exact line dedup: every repeated line keeps only
    its first (doc_id, pos) occurrence corpus-wide.  Lines = 12-token
    analyzer groups (the documents table has no newlines; the grouping
    is exact arithmetic both engines replay).  Two bucketed exchanges,
    line STRINGS as keys (collision-safe)."""
    from kafka_es_ray.pipelines.text_ops import line_dedup
    from kafka_es_ray.sources.parquet import read_table

    return line_dedup(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]),
        line_tokens=12,
    )


def _q_curriculum_order(sf_dir: str):
    """Deterministic curriculum ordering: curriculum_pos = exact rank in
    (n_chars desc, doc_id asc) order — sample-sort ranges, one bucketed
    exchange, driver sees only per-range count scalars."""
    from kafka_es_ray.pipelines.sampling import curriculum_order
    from kafka_es_ray.sources.parquet import read_table

    return curriculum_order(
        read_table(sf_dir, "documents", columns=["doc_id", "n_chars"]), "n_chars"
    )


def _q_cap_per_source(sf_dir: str):
    """Per-source quota capping (the C4/RefinedWeb host-cap curation op):
    keep the best 10 docs per source by (n_chars desc, doc_id asc) —
    per-batch combiner cut + one bucketed group exchange."""
    from kafka_es_ray.pipelines.sampling import cap_per_group
    from kafka_es_ray.sources.parquet import read_table

    return cap_per_group(
        read_table(sf_dir, "documents", columns=["doc_id", "source", "n_chars"]),
        10,
    )


def _q_fingerprint(sf_dir: str):
    from kafka_es_ray.pipelines.text_ops import doc_fingerprint
    from kafka_es_ray.sources.parquet import read_table

    return doc_fingerprint(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


def _q_lang_stats(sf_dir: str):
    from kafka_es_ray.pipelines.text_ops import lang_stats
    from kafka_es_ray.sources.parquet import read_table

    return lang_stats(read_table(sf_dir, "documents", columns=["doc_id", "text", "lang", "n_chars"]))


def _q_quality(sf_dir: str):
    from kafka_es_ray.pipelines.text_ops import doc_quality
    from kafka_es_ray.sources.parquet import read_table

    return doc_quality(read_table(sf_dir, "documents", columns=["doc_id", "text"]))



def _q_decontaminated_corpus(sf_dir: str):
    """Decontamination: surviving training docs (zero distinct 4-gram
    overlap with the benchmark slice doc_id % 50 == 0) — the actionable
    removal step atop the contamination scan."""
    from kafka_es_ray.pipelines.dedup_ops import decontaminate
    from kafka_es_ray.sources.parquet import read_table

    def _slice(keep_bench: bool):
        import pyarrow as pa

        def f(b):
            m = b.column("doc_id").to_numpy() % 50 == 0
            return b.filter(pa.array(m if keep_bench else ~m))

        return f

    docs = lambda: read_table(sf_dir, "documents", columns=["doc_id", "text"])  # noqa: E731
    bench = docs().map_batches(_slice(True), batch_format="pyarrow")
    corpus = docs().map_batches(_slice(False), batch_format="pyarrow")
    out = decontaminate(corpus, bench, n=4).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_contamination(sf_dir: str):
    """Benchmark-contamination check: distinct 4-gram overlap of each
    training doc (doc_id % 50 != 0) against the benchmark slice
    (doc_id % 50 == 0) — benchmark n-gram set broadcast once, corpus
    streams."""
    from kafka_es_ray.pipelines.dedup_ops import contamination_check
    from kafka_es_ray.sources.parquet import read_table

    def _slice(keep_bench: bool):
        import pyarrow as pa

        def f(b):
            m = b.column("doc_id").to_numpy() % 50 == 0
            return b.filter(pa.array(m if keep_bench else ~m))

        return f

    docs = lambda: read_table(sf_dir, "documents", columns=["doc_id", "text"])  # noqa: E731
    bench = docs().map_batches(_slice(True), batch_format="pyarrow")
    train = docs().map_batches(_slice(False), batch_format="pyarrow")
    out = contamination_check(train, bench, n=4).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_chunk_documents(sf_dir: str):
    """Pre-training chunking: 64-token windows advancing by 48 (overlap
    16), early-stop once a window reaches the doc end; chunk text md5'd
    for the oracle compare."""
    import hashlib

    from kafka_es_ray.pipelines.text_ops import chunk_documents
    from kafka_es_ray.sources.parquet import read_table

    out = chunk_documents(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]), size=64, stride=48
    ).to_pandas()
    out["chunk_md5"] = out["chunk"].map(lambda s: hashlib.md5(s.encode()).hexdigest())
    return (
        out[["doc_id", "chunk_idx", "n_tokens", "chunk_md5"]]
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )


def _q_pii_scan(sf_dir: str):
    """PII scan/redaction over documents with deterministic injected PII
    (the synthetic corpus has none): docs doc_id%5==0 gain an email,
    doc_id%7==0 an IPv4; counts + md5 of the redacted text are
    SQL-mirrored (RE2 patterns on both sides)."""
    import hashlib

    import pandas as pd

    from kafka_es_ray.pipelines.text_ops import pii_scan
    from kafka_es_ray.sources.parquet import read_table

    def inject(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy()
        t = b["text"].copy()
        m5 = ids % 5 == 0
        t[m5] = t[m5] + " contact" + pd.Series(ids[m5].astype(str), index=t[m5].index) + "@example.com"
        m7 = ids % 7 == 0
        t[m7] = t[m7] + " from 10.0.0.1"
        return b.assign(text=t)

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        inject, batch_format="pandas"
    )
    out = pii_scan(docs).to_pandas()
    out["redacted_md5"] = out["redacted"].map(lambda s: hashlib.md5(s.encode()).hexdigest())
    return (
        out[["doc_id", "n_emails", "n_ips", "redacted_md5"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _q_stratified_sample(sf_dir: str):
    """Dataset-mixing sample: keep en at 30%, de at 50%, everything else
    at 10% — hash-of-id thresholds (md5_number_lower contract), so the
    kept set is reproducible and SQL-replayable."""
    from kafka_es_ray.pipelines.sampling import stratified_sample
    from kafka_es_ray.sources.parquet import read_table

    out = stratified_sample(
        read_table(sf_dir, "documents", columns=["doc_id", "lang"]),
        {"en": 0.30, "de": 0.50},
        default_rate=0.10,
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_train_holdout(sf_dir: str):
    """Leakage-safe 10% holdout split: membership is a pure function of
    doc_id, so resharding or re-runs never move a doc across the
    boundary."""
    from kafka_es_ray.pipelines.sampling import train_holdout_split
    from kafka_es_ray.sources.parquet import read_table

    out = train_holdout_split(
        read_table(sf_dir, "documents", columns=["doc_id"]), 0.10
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_gopher_quality(sf_dir: str):
    """Gopher-style repetition/quality filter signals per doc (token
    count, mean word length, most-repeated-word fraction, top-bigram
    character fraction, keep flag) — one streaming pass, no shuffle."""
    from kafka_es_ray.pipelines.text_ops import gopher_quality
    from kafka_es_ray.sources.parquet import read_table

    return gopher_quality(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


def _q_dup_ngram_stats(sf_dir: str):
    """Within-doc duplicate 2-gram repetition signals (Rae et al. 2021
    SA1.1 adapted to token positions): occurrence fraction + position
    coverage of n-gram keys repeating inside one doc — one streaming
    pass, no shuffle.  n=2 so the synthetic corpus produces a
    non-trivial value distribution (5-gram repeats don't occur in it)."""
    from kafka_es_ray.pipelines.text_ops import dup_ngram_stats
    from kafka_es_ray.sources.parquet import read_table

    return dup_ngram_stats(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]), n=2
    )


def _q_cross_doc_ngram_dups(sf_dir: str):
    """Cross-document duplicate 8-gram spans (the Lee et al. 2022
    exact-substring dedup signal at n-gram granularity): per doc, window
    occurrences whose key appears in >= 2 docs — distinct-(doc,key)
    combiner, bucketed df exchange, co-partitioned join back, doc-keyed
    rollup (nothing key-wide on the driver)."""
    from kafka_es_ray.pipelines.text_ops import cross_doc_ngram_dups
    from kafka_es_ray.sources.parquet import read_table

    return cross_doc_ngram_dups(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]), n=8
    )


def _q_lang_id(sf_dir: str):
    from kafka_es_ray.pipelines.text_ops import lang_id
    from kafka_es_ray.sources.parquet import read_table

    return lang_id(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


def _q_simhash(sf_dir: str):
    from kafka_es_ray.pipelines.dedup_ops import simhash64
    from kafka_es_ray.sources.parquet import read_table

    return simhash64(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


def _q_minhash_dups(sf_dir: str):
    from kafka_es_ray.pipelines.dedup_ops import minhash_dedup
    from kafka_es_ray.sources.parquet import read_table

    return minhash_dedup(read_table(sf_dir, "documents", columns=["doc_id", "text"]), threshold=0.8)


def _q_embedding_neardup(sf_dir: str):
    # approximate LSH-bucketed scale path (rows-only; recall measured vs
    # the exact oracle in tests/test_pipelines.py)
    from kafka_es_ray.pipelines.dedup_ops import embedding_neardup
    from kafka_es_ray.sources.parquet import read_table

    return embedding_neardup(read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]), 0.2)


def _q_semdedup(sf_dir: str):
    # SemDeDup (cluster-then-compare; rows-only — approximate by
    # construction; recall vs exact measured in tests/test_pipelines.py)
    from kafka_es_ray.pipelines.dedup_ops import semdedup
    from kafka_es_ray.sources.parquet import read_table

    return semdedup(
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        threshold=0.2, nlist=16,
    )


def _q_embedding_kmeans(sf_dir: str):
    """Spherical k-means corpus clustering (rows-only — centroid
    training is iterative, not SQL-expressible; assignment invariants
    pinned by pytest): every embedding assigned to its argmax-cosine
    centroid in one broadcast streaming pass."""
    from kafka_es_ray.pipelines.ann import embedding_kmeans
    from kafka_es_ray.sources.parquet import read_table

    return embedding_kmeans(
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        k=16,
    )


def _q_embedding_neardup_exact(sf_dir: str):
    # exact all-pairs oracle path (SQL-checkable), restricted to a fixed
    # id range so the quadratic oracle stays cheap at sf0.01
    import pandas as pd

    from kafka_es_ray.pipelines.dedup_ops import embedding_neardup_exact
    from kafka_es_ray.sources.parquet import read_table

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
        lambda b: b[b["vec_id"] < 1000], batch_format="pandas"
    )
    return embedding_neardup_exact(emb, threshold=0.2)


def _q_pages_pipeline(sf_dir: str):
    # input_hint-shaped corpus synthesized at small scale (FIXTURES.md §1)
    from kafka_es_ray.pipelines.fulltext import pages_pipeline

    return pages_pipeline(n_rows=1000)


def _q_actions_incremental(sf_dir: str):
    """Continuous-ingest flow: base index from an action stream, then a
    delta batch (upserts + deletes) applied as delta segments +
    tombstones; returns the live top-k per derived query (rows-only)."""
    import shutil
    import tempfile

    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.pipelines.actions_flow import index_from_actions, update_index_from_actions
    from kafka_es_ray.query.engine import IndexSearcher

    cfg = EngineConfig(num_partitions=4)
    idx = tempfile.mkdtemp(prefix="kafka_es_ray_incq_")
    try:
        base = pd.DataFrame(
            [
                ("t", i, '{"index":{"id":"doc%d"}}' % i, '{"title":"base doc %d alpha"}' % i, None)
                for i in range(50)
            ],
            columns=["topic", "seq", "action", "value", "tag"],
        )
        index_from_actions(rd.from_pandas(base), idx, cfg)
        delta = pd.DataFrame(
            [("t", 100 + i, '{"update":{"id":"doc%d"}}' % i, '{"doc":{"title":"updated doc %d beta"}}' % i, None) for i in range(0, 20)]
            + [("t", 200 + i, '{"delete":{"id":"doc%d"}}' % i, None, None) for i in range(40, 50)],
            columns=["topic", "seq", "action", "value", "tag"],
        )
        update_index_from_actions(idx, rd.from_pandas(delta), cfg)
        s = IndexSearcher(idx, cfg)
        beta = s.search("beta", k=100)
        alpha = s.search("alpha", k=100)
        out = pd.concat(
            [beta.assign(query="beta"), alpha.assign(query="alpha")], ignore_index=True
        )
        return out[["query", "rank", "key", "score"]]
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_actions_protobuf(sf_dir: str):
    """Protobuf-wire ingestion (the ProtobufConverter path,
    ProtobufConverter.kt:62-117): proto-encoded action headers + proto
    message values -> parse -> resolve -> index -> BM25 (rows-only)."""
    import shutil
    import tempfile

    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.functions.protowire import BULK_ACTION, OP_DELETE, OP_INDEX, TEST_DOCUMENT
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.query.engine import IndexSearcher
    from kafka_es_ray.stages.actions import ParseProtobufActionsStage, resolve_actions

    rows = [
        (
            "t",
            i,
            BULK_ACTION.encode({"op_type": OP_INDEX, "id": f"p{i}"}),
            TEST_DOCUMENT.encode({"id": i, "name": f"proto doc {i} gamma term{i % 7}"}),
            None,
        )
        for i in range(60)
    ] + [
        ("t", 100 + i, BULK_ACTION.encode({"op_type": OP_DELETE, "id": f"p{i}"}), None, None)
        for i in range(0, 10)
    ]
    recs = pd.DataFrame(rows, columns=["topic", "seq", "action", "value", "tag"])
    parsed = rd.from_pandas(recs).map_batches(
        ParseProtobufActionsStage,
        fn_constructor_kwargs={"protobuf_class": "evo_kafka_es.TestDocument", "default_index": "t"},
        batch_format="pandas",
        concurrency=2,
    )
    live = resolve_actions(parsed)

    def extract(b: pd.DataFrame) -> pd.DataFrame:
        import json as _json

        return pd.DataFrame(
            {
                "id": b["id"],
                "seq": b["seq"],
                "text": b["source"].map(lambda s: _json.loads(s).get("name", "")),
                "lang": "en",
            }
        )

    cfg = EngineConfig(num_partitions=4)
    idx = tempfile.mkdtemp(prefix="kafka_es_ray_proto_")
    try:
        build_index(
            live.map_batches(extract, batch_format="pandas"), idx, cfg,
            key_col="id", html_col=None, ts_col=None, seq_col="seq",
        )
        s = IndexSearcher(idx, cfg)
        return s.search("gamma", k=100)[["rank", "key", "score"]]
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_distinct_users(sf_dir: str):
    """EXACT distinct users (bucketed combiner; SQL-oracle-checked) —
    the exact companion of the HLL approx_distinct_users sketch."""
    import pandas as pd

    from kafka_es_ray.pipelines.relational import exact_distinct
    from kafka_es_ray.sources.parquet import read_table

    n = exact_distinct(read_table(sf_dir, "events", columns=["user_id"]), "user_id")
    return pd.DataFrame({"distinct_users": [n]}).astype({"distinct_users": "int64"})


def _q_approx_distinct(sf_dir: str):
    """HLL mergeable-sketch approximate distinct users (rows-only:
    approximate by design; accuracy asserted in tests)."""
    import pandas as pd

    from kafka_es_ray.pipelines.sketches import approx_distinct
    from kafka_es_ray.sources.parquet import read_table

    est = approx_distinct(read_table(sf_dir, "events", columns=["user_id"]), "user_id")
    return pd.DataFrame({"approx_distinct_users": [int(round(est))]})


def _q_heavy_hitters_event_types(sf_dir: str):
    """Count-Min-sketch top-k frequent values over a LOW-cardinality
    column (5 event types << sketch width 4096): per-batch distinct sets
    are collision-free, so the CMS point estimates equal the exact
    counts and the result is SQL-oracle-checkable.  The distributed
    shape (O(depth*width) partials merged by addition) is identical to
    the high-cardinality path."""
    from kafka_es_ray.pipelines.sketches import heavy_hitters
    from kafka_es_ray.sources.parquet import read_table

    out = heavy_hitters(
        read_table(sf_dir, "events", columns=["event_type"]), "event_type", k=5
    )
    return out.astype({"approx_count": "int64"})


def _q_heavy_hitters_users(sf_dir: str):
    """CMS heavy hitters over user_id (rows-only: approximate upper-bound
    counts by design; accuracy + merge invariance asserted in
    test_sketches)."""
    from kafka_es_ray.pipelines.sketches import heavy_hitters
    from kafka_es_ray.sources.parquet import read_table

    out = heavy_hitters(
        read_table(sf_dir, "events", columns=["user_id"]), "user_id", k=20
    )
    return out.astype({"approx_count": "int64"})


def _q_media_resize(sf_dir: str):
    """Image resize pipeline (decode -> nearest-neighbor 16x16 ->
    re-encode PNG) over the deterministic media fixture; undecodable
    payloads pass through decoded=False.  Binary outputs -> rows-only."""
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.pipelines.multimodal import make_media_fixture, media_resize

    out = media_resize(rd.from_pandas(make_media_fixture(64)), 16, 16).to_pandas()
    return pd.DataFrame(
        {
            "media_id": out["media_id"],
            "kind": out["kind"],
            "decoded": out["decoded"].astype(np.int64),
            "out_bytes": out["payload"].map(lambda p: len(p or b"")).astype(np.int64),
        }
    ).sort_values("media_id").reset_index(drop=True)


def _q_frame_sample(sf_dir: str):
    """Video frame sampling (every 3rd frame from the KFV test container)
    over a deterministic video fixture.  Binary outputs -> rows-only."""
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.pipelines.multimodal import frame_sample, make_video_fixture

    out = frame_sample(rd.from_pandas(make_video_fixture(16)), every=3).to_pandas()
    return pd.DataFrame(
        {
            "media_id": out["media_id"],
            "frame_idx": out["frame_idx"],
            "width": out["width"].astype(np.int64),
            "height": out["height"].astype(np.int64),
        }
    ).sort_values(["media_id", "frame_idx"]).reset_index(drop=True)


def _q_media_features(sf_dir: str):
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.pipelines.multimodal import make_media_fixture, media_features

    out = media_features(rd.from_pandas(make_media_fixture(64)))

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        # NA-free driver-facing schema: -1 = dimension not applicable
        # (audio/video rows have no width/height)
        return pd.DataFrame(
            {
                "media_id": b["media_id"].astype("int64"),
                "kind": b["kind"],
                "format": b["format"].fillna("unknown"),
                "width": b["width"].fillna(-1).astype("int64"),
                "height": b["height"].fillna(-1).astype("int64"),
                "decoded": b["decoded"].astype(bool),
                "payload_bytes": b["payload_bytes"].astype("int64"),
            }
        )

    return out.map_batches(finalize, batch_format="pandas")


def _build_geo_docs_index(sf_dir: str, idx: str):
    """documents + the deterministic ``loc`` geo_point field -> inverted
    index with loc_lat/loc_lon numeric docstore columns (the engine's geo
    storage model, functions/geo.py).  Returns the EngineConfig."""
    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import geo_documents_dataset

    cfg = EngineConfig(num_partitions=8, numeric_cols=("loc_lat", "loc_lon"))
    build_index(
        geo_documents_dataset(sf_dir), idx, cfg,
        key_col="key", lang_col="lang", html_col=None, ts_col=None,
        id_col="doc_id",
    )
    return cfg


def _q_geo_distance_filter_topk(sf_dir: str):
    """ES bool query with a geo_distance filter clause: BM25 top-10 over
    the derived queries, keeping only docs whose ``loc`` point lies
    within 7,000 km round6 arc distance of (10, 20) — the distributed
    run_queries path with the per-segment geo post-filter."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_geoidx_")
    try:
        cfg = _build_geo_docs_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"].assign(
            geo_field="loc", geo_lat=10.0, geo_lon=20.0,
            geo_distance_m=7_000_000.0,
        )
        out = run_queries(queries, idx, cfg).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_geo_polygon_filter_topk(sf_dir: str):
    """ES geo_polygon filter clause: BM25 top-10 keeping only docs whose
    ``loc`` point lies inside the convex triangle (0,-60) (60,0) (-30,70)
    — planar half-plane tests per segment (convexity is the documented
    contract; _geo_poly_keep)."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_gplidx_")
    try:
        cfg = _build_geo_docs_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"].assign(
            geo_poly_field="loc", geo_poly_pts="0:-60|60:0|-30:70"
        )
        out = run_queries(queries, idx, cfg).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_geo_bbox_filter_topk(sf_dir: str):
    """ES geo_bounding_box filter clause: BM25 top-10 keeping only docs
    whose ``loc`` point lies in the inclusive box lat [-30, 60] x
    lon [-90, 90] — rewritten to two numeric range filters over the
    mapped lat/lon columns (the ES bounding-box semantics)."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_queries

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_gbbidx_")
    try:
        cfg = _build_geo_docs_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"].assign(
            geo_bbox_field="loc", geo_bbox_top=60.0, geo_bbox_left=-90.0,
            geo_bbox_bottom=-30.0, geo_bbox_right=90.0,
        )
        out = run_queries(queries, idx, cfg).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_ip_range_agg(sf_dir: str):
    """ES ip_range aggregation per derived query: CIDR + from/to bucket
    counts over the deterministic integer-ip column
    ip = (doc_id * 2654435761) % 2^32 — (query, range) count plans
    through the shared MatchSet sweep."""
    import shutil
    import tempfile

    import pyarrow as pa

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.pipelines.fulltext import derive_query_set, documents_dataset
    from kafka_es_ray.query.engine import IndexSearcher, run_agg_ip_range

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_ipidx_")
    try:
        cfg = EngineConfig(num_partitions=8, numeric_cols=("ip",))

        def add_ip(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
            ip = ((ids * 2654435761) % (1 << 32)).astype(np.float64)
            return batch.append_column("ip", pa.array(ip))

        build_index(
            documents_dataset(sf_dir).map_batches(add_ip, batch_format="pyarrow"),
            idx, cfg,
            key_col="key", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        ranges = [
            {"mask": "0.0.0.0/2"},
            {"mask": "64.0.0.0/2"},
            {"from": "128.0.0.0", "to": "192.0.0.0"},
            {"from": "192.0.0.0"},
        ]
        return run_agg_ip_range(queries, idx, "ip", ranges, cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_geo_line_agg(sf_dir: str):
    """ES geo_line aggregation per derived query: first 20 located
    matching docs' points in doc_id order — one GeoLineStage sweep plus
    one bucketed per-plan merge; one row per line vertex."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_geo_line

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_glidx_")
    try:
        cfg = _build_geo_docs_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_geo_line(queries, idx, "loc", size=20, cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_geo_distance_agg(sf_dir: str):
    """ES geo_distance aggregation: ring doc counts by round6 arc
    distance from (10, 20), edges (0, 2e6, 5e6, 1e7) m, over each derived
    query's match set — distributed NumericAggStage sweep on the derived
    per-doc distance virtual field."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_agg_geo_distance

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_grgidx_")
    try:
        cfg = _build_geo_docs_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_agg_geo_distance(
            queries, idx, "loc", 10.0, 20.0, (0.0, 2e6, 5e6, 1e7), cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_geotile_grid_agg(sf_dir: str):
    """ES geotile_grid aggregation at zoom 3: top-10 web-mercator map
    tiles ("3/x/y") by doc count per derived query's match set, cut by
    (count desc, packed cell asc)."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_agg_geotile_grid

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_gtlidx_")
    try:
        cfg = _build_geo_docs_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_agg_geotile_grid(queries, idx, "loc", zoom=3, size=10, cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_geo_distance_sort(sf_dir: str):
    """ES sort by _geo_distance: each derived query's match set ranked by
    round6 arc distance from ``loc`` to (10, 20) ascending (ties doc_id
    asc) — the SortTopkStage path on the derived-distance virtual field."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_sorted

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_gsridx_")
    try:
        cfg = _build_geo_docs_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        out = run_sorted(
            queries, idx, {"geo_distance": ("loc", 10.0, 20.0)},
            ascending=True, k=10, cfg=cfg,
        ).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "sort_val"]]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_geohash_grid_agg(sf_dir: str):
    """ES geohash_grid aggregation at precision 2: top-10 base32 geohash
    cells by doc count per derived query's match set, cut by (count
    desc, cell asc)."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_agg_geohash_grid

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_ghsidx_")
    try:
        cfg = _build_geo_docs_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_agg_geohash_grid(
            queries, idx, "loc", precision=2, size=10, cfg=cfg
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_geo_centroid_agg(sf_dir: str):
    """ES geo_centroid aggregation: mean (lat, lon) of each derived
    query's matched points, round6 — matrix-stats exact-sum partials."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_agg_geo_centroid

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_gctidx_")
    try:
        cfg = _build_geo_docs_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_agg_geo_centroid(queries, idx, "loc", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _q_geo_bounds_agg(sf_dir: str):
    """ES geo_bounds aggregation: tightest (top, left, bottom, right)
    box around each derived query's matched points — exact min/max via
    the stats-partial sweeps."""
    import shutil
    import tempfile

    from kafka_es_ray.pipelines.fulltext import derive_query_set
    from kafka_es_ray.query.engine import IndexSearcher, run_agg_geo_bounds

    idx = tempfile.mkdtemp(prefix="kafka_es_ray_gbdidx_")
    try:
        cfg = _build_geo_docs_index(sf_dir, idx)
        queries = derive_query_set(IndexSearcher(idx, cfg))
        queries = queries[queries["text"] != "zzzabsentterm"]
        return run_agg_geo_bounds(queries, idx, "loc", cfg=cfg)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "bm25_topk": _q_bm25_topk,
        "bm25_resident_topk": _q_bm25_resident_topk,
        "wrapper_topk": _q_wrapper_topk,
        "terms_lookup_topk": _q_terms_lookup_topk,
        "match_fuzzy_topk": _q_match_fuzzy_topk,
        "match_fuzzy2_topk": _q_match_fuzzy2_topk,
        "match_fuzzy_dl_topk": _q_match_fuzzy_dl_topk,
        "analyzer_stop_topk": _q_analyzer_stop_topk,
        "analyzer_stem_topk": _q_analyzer_stem_topk,
        "linear_hybrid_topk": _q_linear_hybrid_topk,
        "terms_include_agg": _q_terms_include_agg,
        "terms_numeric_agg": _q_terms_numeric_agg,
        "terms_partition_agg": _q_terms_partition_agg,
        "histogram_offset_agg": _q_histogram_offset_agg,
        "significant_terms_bgfilter": _q_significant_terms_bgfilter,
        "weighted_terms_topk": _q_weighted_terms_topk,
        "bm25_topk_and": _q_bm25_topk_and,
        "range_filter_topk": _q_range_filter_topk,
        "script_filter_topk": _q_script_filter_topk,
        "synonyms_topk": _q_synonyms_topk,
        "terminate_after_count": _q_terminate_after_count,
        "search_template_topk": _q_search_template_topk,
        "msearch_template_topk": _q_msearch_template_topk,
        "track_total_hits": _q_track_total_hits,
        "highlight_topk": _q_highlight_topk,
        "render_template": _q_render_template,
        "kw_filter_topk": _q_kw_filter_topk,
        "min_score_topk": _q_min_score_topk,
        "fetch_fields_topk": _q_fetch_fields_topk,
        "script_fields_topk": _q_script_fields_topk,
        "rescore_topk": _q_rescore_topk,
        "knn_topk": _q_knn_topk,
        "knn_filtered_topk": _q_knn_filtered_topk,
        "rrf_hybrid_topk": _q_rrf_hybrid_topk,
        "retriever_tree_topk": _q_retriever_tree_topk,
        "sort_by_field": _q_sort_by_field,
        "runtime_sort_topk": _q_runtime_sort_topk,
        "runtime_stats_agg": _q_runtime_stats_agg,
        "runtime_histogram_agg": _q_runtime_histogram_agg,
        "sort_search_after": _q_sort_search_after,
        "match_stats_agg": _q_match_stats_agg,
        "geo_distance_filter_topk": _q_geo_distance_filter_topk,
        "geo_polygon_filter_topk": _q_geo_polygon_filter_topk,
        "geo_bbox_filter_topk": _q_geo_bbox_filter_topk,
        "geo_distance_agg": _q_geo_distance_agg,
        "geo_line_agg": _q_geo_line_agg,
        "ip_range_agg": _q_ip_range_agg,
        "geotile_grid_agg": _q_geotile_grid_agg,
        "geohash_grid_agg": _q_geohash_grid_agg,
        "geo_centroid_agg": _q_geo_centroid_agg,
        "geo_distance_sort": _q_geo_distance_sort,
        "geo_bounds_agg": _q_geo_bounds_agg,
        "match_histogram": _q_match_histogram,
        "extended_stats_agg": _q_extended_stats,
        "date_histogram_agg": _q_date_histogram,
        "date_histogram_fixed_agg": _q_date_histogram_fixed,
        "date_histogram_filled_agg": _q_date_histogram_filled,
        "range_agg": _q_range_agg,
        "date_range_keyed_agg": _q_date_range_keyed_agg,
        "matrix_stats_agg": _q_matrix_stats,
        "composite_agg": _q_composite_agg,
        "composite_date_agg": _q_composite_date_agg,
        "terms_key_order_agg": _q_terms_key_order_agg,
        "knn_similarity_topk": _q_knn_similarity_topk,
        "cumulative_sum_agg": _q_cumulative_sum,
        "derivative_agg": _q_derivative,
        "bucket_script_agg": _q_bucket_script,
        "stats_bucket_agg": _q_stats_bucket,
        "extended_stats_bucket_agg": _q_extended_stats_bucket,
        "percentiles_bucket_agg": _q_percentiles_bucket,
        "moving_percentiles_agg": _q_moving_percentiles,
        "max_bucket_agg": _q_max_bucket,
        "avg_bucket_agg": _q_avg_bucket,
        "sum_bucket_agg": _q_sum_bucket,
        "min_bucket_agg": _q_min_bucket,
        "filters_agg": _q_filters_agg,
        "random_sampler_agg": _q_random_sampler_agg,
        "adjacency_matrix_agg": _q_adjacency_matrix,
        "moving_fn_agg": _q_moving_fn,
        "bucket_correlation_agg": _q_bucket_correlation,
        "change_point_agg": _q_change_point_agg,
        "bucket_count_ks_agg": _q_bucket_count_ks,
        "serial_diff_agg": _q_serial_diff,
        "bucket_sort_agg": _q_bucket_sort,
        "auto_date_histogram_agg": _q_auto_date_histogram,
        "normalize_agg": _q_normalize,
        "weighted_avg_agg": _q_weighted_avg,
        "multi_terms_agg": _q_multi_terms,
        "string_stats_agg": _q_string_stats,
        "rank_feature_topk": _q_rank_feature_topk,
        "script_score_topk": _q_script_score_topk,
        "top_metrics_agg": _q_top_metrics,
        "pinned_topk": _q_pinned_topk,
        "mad_agg": _q_mad_agg,
        "t_test_agg": _q_t_test_agg,
        "distance_feature_topk": _q_distance_feature_topk,
        "sampler_agg": _q_sampler_agg,
        "diversified_sampler_agg": _q_diversified_sampler_agg,
        "boxplot_agg": _q_boxplot_agg,
        "rate_agg": _q_rate_agg,
        "global_agg": _q_global_agg,
        "scripted_metric_agg": _q_scripted_metric_agg,
        "terms_size_agg": _q_terms_size_agg,
        "validate_query": _q_validate_query,
        "date_range_agg": _q_date_range_agg,
        "missing_agg": _q_missing_agg,
        "value_count_agg": _q_value_count,
        "percentile_ranks": _q_percentile_ranks,
        "explain_score": _q_explain_score,
        "scroll_all": _q_scroll_all,
        "scroll_sliced": _q_scroll_sliced,
        "pit_search": _q_pit_search,
        "cat_indices": _q_cat_indices,
        "msearch_topk": _q_msearch_topk,
        "field_caps": _q_field_caps,
        "has_child_orders": _q_has_child,
        "has_parent_lineitems": _q_has_parent,
        "nested_topk": _q_nested_topk,
        "children_terms_agg": _q_children_terms_agg,
        "parent_terms_agg": _q_parent_terms_agg,
        "has_child_inner_hits": _q_has_child_inner_hits,
        "match_percentiles": _q_match_percentiles,
        "variable_width_histogram_agg": _q_variable_width_histogram,
        "match_subagg": _q_match_subagg,
        "function_score_topk": _q_function_score_topk,
        "decay_gauss_topk": _q_decay_gauss_topk,
        "more_like_this": _q_more_like_this,
        "more_like_this_unlike": _q_more_like_this_unlike,
        "termvectors": _q_termvectors,
        "mtermvectors": _q_mtermvectors,
        "rank_eval": _q_rank_eval,
        "match_cardinality": _q_match_cardinality,
        "rare_terms": _q_rare_terms,
        "significant_terms_kw": _q_significant_terms,
        "significant_terms_chi2": _q_significant_terms_chi2,
        "significant_terms_mi": _q_significant_terms_mi,
        "significant_text": _q_significant_text,
        "categorize_text": _q_categorize_text,
        "collapse_topk": _q_collapse_topk,
        "collapse_inner_hits": _q_collapse_inner_hits,
        "top_hits": _q_top_hits,
        "top_hits_sorted": _q_top_hits_sorted,
        "percolate": _q_percolate,
        "terms_enum": _q_terms_enum,
        "prefix_count": _q_prefix_count,
        "wildcard_count": _q_wildcard_count,
        "regexp_count": _q_regexp_count,
        "fuzzy_count": _q_fuzzy_count,
        "exists_count": _q_exists_count,
        "term_suggest": _q_term_suggest,
        "term_suggest_popular": _q_term_suggest_popular,
        "phrase_suggest": _q_phrase_suggest,
        "completion_suggest": _q_completion_suggest,
        "phrase_prefix_count": _q_phrase_prefix_count,
        "search_after_topk": _q_search_after_topk,
        "multi_index_topk": _q_multi_index_topk,
        "indices_boost_topk": _q_indices_boost_topk,
        "multi_match_topk": _q_multi_match,
        "dis_max_topk": _q_dis_max,
        "multi_match_boost_topk": _q_multi_match_boost,
        "match_title_topk": _q_match_title,
        "bool_topk": _q_bool_topk,
        "constant_score_topk": _q_constant_score,
        "boosting_topk": _q_boosting,
        "terms_set_topk": _q_terms_set,
        "match_bool_prefix_topk": _q_match_bool_prefix,
        "simple_query_string_topk": _q_simple_query_string,
        "ids_query": _q_ids_query,
        "prefix_score_topk": _q_prefix_score_topk,
        "random_score_topk": _q_random_score_topk,
        "combined_fields_topk": _q_combined_fields,
        "cross_fields_topk": _q_cross_fields,
        "index_prefixes_count": _q_index_prefixes_count,
        "match_count": _q_match_count,
        "match_must_not": _q_match_must_not,
        "match_lang_agg": _q_match_lang_agg,
        "match_source_agg": _q_match_source_agg,
        "mget_docs": _q_mget_docs,
        "mget_fields": _q_mget_fields,
        "analyze_api": _q_analyze_api,
        "phrase_topk": _q_phrase_topk,
        "span_near_topk": _q_span_near_topk,
        "span_multi_topk": _q_span_multi_topk,
        "intervals_topk": _q_intervals_topk,
        "span_or_topk": _q_span_or_topk,
        "span_not_topk": _q_span_not_topk,
        "span_containing_topk": _q_span_containing_topk,
        "span_within_topk": _q_span_within_topk,
        "query_string_topk": _q_query_string_topk,
        "span_first_topk": _q_span_first_topk,
        "lineitem_agg": _q_lineitem_agg,
        "topk_orders": _q_topk_orders,
        "ngram_jaccard": _q_ngram_jaccard,
        "dedup_clusters": _q_dedup_clusters,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "lm_score": _q_lm_score,
        "quality_classifier": _q_quality_classifier,
        "lm_quality_buckets": _q_lm_quality_buckets,
        "top_quality_fraction": _q_top_quality_fraction,
        "embedding_pca": _q_embedding_pca,
        "pack_sequences": _q_pack_sequences,
        "mix_epochs": _q_mix_epochs,
        "doc_token_counts": _q_doc_token_counts,
        "term_df": _q_term_df,
        "exact_dedup": _q_exact_dedup,
        "canonical_urls": _q_canonical_urls,
        "url_dedup": _q_url_dedup,
        "domain_blocklist_counts": _q_domain_blocklist_counts,
        "host_quality_filter": _q_host_quality_filter,
        "url_quality": _q_url_quality,
        "lww_events": _q_lww_events,
        "ingest_pipeline": _q_ingest_pipeline,
        "simulate_pipeline": _q_simulate_pipeline,
        "window_events": _q_window_events,
        "sessionize_events": _q_sessionize,
        "cumulative_cardinality_agg": _q_cumulative_cardinality,
        "bpe_token_counts": _q_bpe_token_counts,
        "frequent_pairs_agg": _q_frequent_pairs,
        "props_json_agg": _q_props_json_agg,
        "approx_value_quantiles": _q_approx_value_quantiles,
        "broadcast_lookup": _q_broadcast_lookup,
        "ann_cosine_topk": _q_ann_topk,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "ann_sq8_topk": _q_ann_sq8_topk,
        "ann_sq8_rescore_topk": _q_ann_sq8_rescore_topk,
        "ann_pq_rescore_topk": _q_ann_pq_rescore_topk,
        "ann_pq_topk": _q_ann_pq_topk,
        "ann_ivfpq_topk": _q_ann_ivfpq_topk,
        "cap_per_source": _q_cap_per_source,
        "global_shuffle": _q_global_shuffle,
        "curriculum_order": _q_curriculum_order,
        "line_dedup": _q_line_dedup,
        "doc_fingerprint": _q_fingerprint,
        "lang_stats": _q_lang_stats,
        "doc_quality": _q_quality,
        "gopher_quality": _q_gopher_quality,
        "dup_ngram_stats": _q_dup_ngram_stats,
        "cross_doc_ngram_dups": _q_cross_doc_ngram_dups,
        "contamination": _q_contamination,
        "decontaminated_corpus": _q_decontaminated_corpus,
        "stratified_sample": _q_stratified_sample,
        "train_holdout": _q_train_holdout,
        "pii_scan": _q_pii_scan,
        "chunk_documents": _q_chunk_documents,
        "lang_id": _q_lang_id,
        "simhash": _q_simhash,
        "minhash_dups": _q_minhash_dups,
        "embedding_neardup": _q_embedding_neardup,
        "semdedup": _q_semdedup,
        "embedding_kmeans": _q_embedding_kmeans,
        "embedding_neardup_exact": _q_embedding_neardup_exact,
        "pages_pipeline": _q_pages_pipeline,
        "actions_incremental": _q_actions_incremental,
        "actions_protobuf": _q_actions_protobuf,
        "distinct_users": _q_distinct_users,
        "approx_distinct_users": _q_approx_distinct,
        "heavy_hitters_event_types": _q_heavy_hitters_event_types,
        "heavy_hitters_users": _q_heavy_hitters_users,
        "media_features": _q_media_features,
        "media_resize": _q_media_resize,
        "frame_sample": _q_frame_sample,
    }


def _lang_id_oracle_sql() -> str:
    """DuckDB replay of LangIdStage: same trigram extraction (full 3-grams
    of lower(text)), same integer profile weights, same argmax tie-break
    (score desc, seed-declaration priority asc), 'und' for gram-less docs."""
    from kafka_es_ray.pipelines.text_ops import LangIdStage

    rows = []
    for pri, (lang, prof) in enumerate(LangIdStage.int_profiles().items()):
        for g, w in sorted(prof.items()):
            rows.append("('{}', {}, '{}', {})".format(lang, pri, g.replace("'", "''"), w))
    vals = ",\n              ".join(rows)
    return f"""
        WITH prof(lang, priority, g, w) AS (VALUES {vals}),
        docs AS (SELECT doc_id, lower(coalesce(text, '')) AS t FROM documents),
        grams AS (
          SELECT doc_id, substr(t, i::INTEGER, 3) AS g
          FROM docs, LATERAL (SELECT unnest(range(1, greatest(length(t) - 1, 1))) AS i) idx
        ),
        ng AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
        langs AS (SELECT DISTINCT lang, priority FROM prof),
        scores AS (
          SELECT gr.doc_id, p.lang, sum(p.w) AS s
          FROM grams gr JOIN prof p ON p.g = gr.g GROUP BY 1, 2
        ),
        grid AS (
          SELECT d.doc_id, l.lang, l.priority, coalesce(s.s, 0) AS s
          FROM (SELECT doc_id FROM documents) d
          CROSS JOIN langs l
          LEFT JOIN scores s ON s.doc_id = d.doc_id AND s.lang = l.lang
        ),
        pick AS (
          SELECT doc_id, lang, row_number() OVER (
            PARTITION BY doc_id ORDER BY s DESC, priority ASC) AS rn
          FROM grid
        )
        SELECT d.doc_id,
               CASE WHEN coalesce(ng.n, 0) = 0 THEN 'und' ELSE p.lang END AS lang_pred
        FROM documents d
        LEFT JOIN ng ON ng.doc_id = d.doc_id
        JOIN pick p ON p.doc_id = d.doc_id AND p.rn = 1
    """


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_topk": _BM25_SQL,
        "bm25_resident_topk": _BM25_SQL,
        "wrapper_topk": (
            "SELECT 0::BIGINT AS query_id, rank, doc_id, score FROM ("
            + _BM25_SQL
            + ") WHERE query_id = 1"
        ),
        "terms_lookup_topk": _TERMS_LOOKUP_SQL,
        "match_fuzzy_topk": _MATCH_FUZZY_SQL,
        "match_fuzzy2_topk": _MATCH_FUZZY2_SQL,
        "match_fuzzy_dl_topk": _MATCH_FUZZY_DL_SQL,
        "analyzer_stop_topk": _ANALYZER_STOP_SQL,
        "analyzer_stem_topk": _ANALYZER_STEM_SQL,
        "linear_hybrid_topk": _LINEAR_SQL,
        "terms_include_agg": _TERMS_INCLUDE_SQL,
        "terms_numeric_agg": _TERMS_NUMERIC_SQL,
        "terms_partition_agg": _TERMS_PARTITION_SQL,
        "histogram_offset_agg": _HISTOGRAM_OFFSET_SQL,
        "significant_terms_bgfilter": _SIGTERMS_BGF_SQL,
        "weighted_terms_topk": _WEIGHTED_TERMS_SQL,
        "range_filter_topk": _RANGE_SQL,
        "script_filter_topk": _SCRIPT_FILTER_SQL,
        "synonyms_topk": _SYNONYMS_SQL,
        "search_template_topk": _SEARCH_TEMPLATE_SQL,
        # q0 range-filtered, q1-3 plain == the same expected frame (the
        # rendered open-range defaults are vacuous on this data)
        "msearch_template_topk": _SEARCH_TEMPLATE_SQL,
        "track_total_hits": _TRACK_TOTALS_SQL,
        "highlight_topk": _HIGHLIGHT_SQL,
        "terminate_after_count": _terminate_after_sql(),
        "render_template": _RENDER_TEMPLATE_SQL,
        "kw_filter_topk": _KW_FILTER_SQL,
        "min_score_topk": _MIN_SCORE_SQL,
        "fetch_fields_topk": _FETCH_FIELDS_SQL,
        "script_fields_topk": _SCRIPT_FIELDS_SQL,
        "rescore_topk": _RESCORE_SQL,
        "knn_topk": _KNN_SQL,
        "knn_filtered_topk": _KNN_FILTERED_SQL,
        "rrf_hybrid_topk": _RRF_SQL,
        "retriever_tree_topk": _RRF_SQL,
        # multi-index over a parity split == the combined single index;
        # index_id (ES _index) falls out of the parity rule
        "indices_boost_topk": _INDICES_BOOST_SQL,
        "multi_index_topk": _BM25_SQL.replace(
            "SELECT query_id, rank::BIGINT AS rank, doc_id, score",
            "SELECT query_id, rank::BIGINT AS rank, doc_id, score,"
            " (doc_id % 2)::BIGINT AS index_id",
        ),
        # page 2 via cursor == global ranks 11-20, ranks rebased to 1-10
        "search_after_topk": _BM25_SQL.replace(
            "FROM topk WHERE rank <= 10",
            "FROM (SELECT query_id, (rank - 10)::BIGINT AS rank, doc_id, score"
            " FROM topk WHERE rank BETWEEN 11 AND 20) t",
        ),
        "sort_by_field": _SORT_FIELD_SQL,
        "runtime_sort_topk": _RUNTIME_SORT_SQL,
        "runtime_stats_agg": _RUNTIME_STATS_SQL,
        "runtime_histogram_agg": _RUNTIME_HIST_SQL,
        "sort_search_after": _SORT_AFTER_SQL,
        "match_stats_agg": _STATS_AGG_SQL,
        "geo_distance_filter_topk": _GEO_DIST_FILTER_SQL,
        "geo_polygon_filter_topk": _GEO_POLY_FILTER_SQL,
        "geo_bbox_filter_topk": _GEO_BBOX_FILTER_SQL,
        "geo_distance_agg": _GEO_RING_SQL,
        "geo_line_agg": _GEO_LINE_SQL,
        "ip_range_agg": _IP_RANGE_SQL,
        "geotile_grid_agg": _GEO_TILE_SQL,
        "geohash_grid_agg": _GEOHASH_SQL,
        "geo_centroid_agg": _GEO_CENTROID_SQL,
        "geo_distance_sort": _GEO_SORT_SQL,
        "geo_bounds_agg": _GEO_BOUNDS_SQL,
        "extended_stats_agg": _EXT_STATS_SQL,
        "date_histogram_agg": _DATE_HIST_SQL,
        "date_histogram_fixed_agg": _DATE_HIST_FIXED_SQL,
        "date_histogram_filled_agg": _DATE_HIST_FILLED_SQL,
        "range_agg": _RANGE_AGG_SQL,
        "date_range_keyed_agg": _DATE_RANGE_KEYED_SQL,
        "matrix_stats_agg": _MATRIX_STATS_SQL,
        "composite_agg": _COMPOSITE_SQL,
        "composite_date_agg": _COMPOSITE_DATE_SQL,
        "terms_key_order_agg": _TERMS_KEY_ORDER_SQL,
        # the knn SQL with the similarity cutoff applied before ranking
        "knn_similarity_topk": _KNN_SQL.replace(
            "topk AS (",
            "cut AS (SELECT * FROM sims WHERE score >= 0.3),\ntopk AS (",
        ).replace("FROM sims\n)", "FROM cut\n)"),
        "cumulative_sum_agg": _CUMSUM_SQL,
        "derivative_agg": _DERIV_SQL,
        "bucket_script_agg": _BUCKET_SCRIPT_SQL,
        "stats_bucket_agg": _STATS_BUCKET_SQL,
        "extended_stats_bucket_agg": _EXT_STATS_BUCKET_SQL,
        "percentiles_bucket_agg": _PCTL_BUCKET_SQL,
        "moving_percentiles_agg": _MOVING_PCTL_SQL,
        "max_bucket_agg": _MAX_BUCKET_SQL,
        "avg_bucket_agg": _AVG_BUCKET_SQL,
        "sum_bucket_agg": _SUM_BUCKET_SQL,
        "min_bucket_agg": _MIN_BUCKET_SQL,
        "filters_agg": _FILTERS_AGG_SQL,
        "random_sampler_agg": _RANDOM_SAMPLER_SQL,
        "frequent_pairs_agg": _FREQ_PAIRS_SQL,
        "adjacency_matrix_agg": _ADJ_MATRIX_SQL,
        "moving_fn_agg": _MOVING_FN_SQL,
        "bucket_correlation_agg": _BUCKET_CORR_SQL,
        "bucket_count_ks_agg": _BUCKET_KS_SQL,
        "serial_diff_agg": _SERIAL_DIFF_SQL,
        "bucket_sort_agg": _BUCKET_SORT_SQL,
        "auto_date_histogram_agg": _AUTO_DH_SQL,
        "normalize_agg": _NORMALIZE_SQL,
        "weighted_avg_agg": _WEIGHTED_AVG_SQL,
        "multi_terms_agg": _MULTI_TERMS_SQL,
        "string_stats_agg": _STRING_STATS_SQL,
        "rank_feature_topk": _RANK_FEATURE_SQL,
        "script_score_topk": _SCRIPT_SCORE_SQL,
        "top_metrics_agg": _TOP_METRICS_SQL,
        "pinned_topk": _PINNED_SQL,
        "mad_agg": _MAD_SQL,
        "t_test_agg": _TTEST_SQL,
        "distance_feature_topk": _DISTANCE_FEATURE_SQL,
        "sampler_agg": _SAMPLER_SQL,
        "diversified_sampler_agg": _DIVERSIFIED_SAMPLER_SQL,
        "boxplot_agg": _BOXPLOT_SQL,
        "rate_agg": _RATE_SQL,
        "global_agg": _GLOBAL_AGG_SQL,
        "scripted_metric_agg": _SCRIPTED_METRIC_SQL,
        "terms_size_agg": _TERMS_SIZE_SQL,
        "validate_query": """
            SELECT * FROM (VALUES
              (0::BIGINT, true), (1::BIGINT, false),
              (2::BIGINT, false), (3::BIGINT, false)
            ) AS t(query_id, valid) ORDER BY 1
        """,
        "date_range_agg": _DATE_RANGE_SQL,
        "missing_agg": _MISSING_AGG_SQL,
        "value_count_agg": _VALUE_COUNT_SQL,
        "percentile_ranks": _PCT_RANKS_SQL,
        "explain_score": _EXPLAIN_SQL,
        "scroll_all": _SCROLL_SQL,
        "scroll_sliced": _SLICED_SCROLL_SQL,
        # PIT parity: the oracle computes over the UNCHANGED documents
        # table — equality proves the post-PIT mutation stayed invisible
        "pit_search": _BM25_SQL,
        "cat_indices": _CAT_INDICES_SQL,
        "msearch_topk": _BM25_SQL,
        "has_child_orders": _HAS_CHILD_SQL,
        "has_parent_lineitems": _HAS_PARENT_SQL,
        "nested_topk": _NESTED_SQL,
        "children_terms_agg": _CHILDREN_TERMS_SQL,
        "parent_terms_agg": _PARENT_TERMS_SQL,
        "has_child_inner_hits": _HAS_CHILD_INNER_SQL,
        "match_histogram": _HISTOGRAM_SQL,
        "match_percentiles": _PERCENTILES_SQL,
        "match_subagg": _SUBAGG_SQL,
        "function_score_topk": _FVF_SQL,
        "decay_gauss_topk": _DECAY_SQL,
        "more_like_this": _MLT_SQL,
        "more_like_this_unlike": _MLT_UNLIKE_SQL,
        "rank_eval": _RANK_EVAL_SQL,
        "termvectors": f"""
            WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            srcs AS (
              SELECT doc_id AS src_id,
                     (row_number() OVER (ORDER BY doc_id) - 1)::BIGINT AS query_id
              FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 3)
            ),
            toks_pos AS (
              SELECT s.query_id, unnest(t.toks) AS term,
                     unnest(generate_series(1, len(t.toks))) AS pos
              FROM srcs s JOIN t ON t.doc_id = s.src_id
            ),
            tv AS (
              SELECT query_id, term, count(*)::BIGINT AS tf,
                     (min(pos) - 1)::BIGINT AS first_pos
              FROM toks_pos GROUP BY 1, 2
            ),
            alltf AS (
              SELECT DISTINCT doc_id, term
              FROM (SELECT doc_id, unnest(toks) AS term FROM t)
            ),
            df AS (SELECT term, count(*)::BIGINT AS df FROM alltf GROUP BY 1)
            SELECT tv.query_id, tv.term, tv.tf, df.df, tv.first_pos
            FROM tv JOIN df USING (term) ORDER BY 1, 2
        """,
        "mtermvectors": f"""
            WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            srcs AS (
              SELECT doc_id AS src_id, CAST(doc_id AS VARCHAR) AS key
              FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 5)
            ),
            toks_pos AS (
              SELECT s.key, unnest(t.toks) AS term,
                     unnest(generate_series(1, len(t.toks))) AS pos
              FROM srcs s JOIN t ON t.doc_id = s.src_id
            ),
            tv AS (
              SELECT key, term, count(*)::BIGINT AS tf,
                     (min(pos) - 1)::BIGINT AS first_pos
              FROM toks_pos GROUP BY 1, 2
            ),
            alltf AS (
              SELECT DISTINCT doc_id, term
              FROM (SELECT doc_id, unnest(toks) AS term FROM t)
            ),
            df AS (SELECT term, count(*)::BIGINT AS df FROM alltf GROUP BY 1)
            SELECT tv.key, tv.term, tv.tf, df.df, tv.first_pos
            FROM tv JOIN df USING (term) ORDER BY 1, 2
        """,
        "match_cardinality": _CARDINALITY_SQL,
        "rare_terms": _RARE_TERMS_SQL,
        "significant_terms_kw": _SIGTERMS_KW_SQL,
        "significant_terms_chi2": _SIGTERMS_CHI2_SQL,
        "significant_terms_mi": _SIGTERMS_MI_SQL,
        "significant_text": _SIGTEXT_SQL,
        "categorize_text": _CATEGORIZE_TEXT_SQL,
        "collapse_topk": _COLLAPSE_SQL,
        "collapse_inner_hits": _COLLAPSE_INNER_SQL,
        "top_hits": _TOP_HITS_SQL,
        "top_hits_sorted": _TOP_HITS_SORTED_SQL,
        "percolate": _PERCOLATE_SQL,
        "bm25_topk_and": _BM25_AND_SQL,
        "multi_match_topk": _MULTI_MATCH_SQL,
        "dis_max_topk": _DIS_MAX_SQL,
        "multi_match_boost_topk": _MULTI_MATCH_BOOST_SQL,
        "match_title_topk": _MATCH_TITLE_SQL,
        "bool_topk": _BOOL_SQL,
        "constant_score_topk": _CONST_SQL,
        "boosting_topk": _BOOSTING_SQL,
        "terms_set_topk": _TERMS_SET_SQL,
        "match_bool_prefix_topk": _MBP_SQL,
        "simple_query_string_topk": _SQS_SQL,
        "ids_query": _IDS_SQL,
        "prefix_score_topk": _PREFIX_SCORE_SQL,
        "random_score_topk": _RANDOM_SCORE_SQL,
        "combined_fields_topk": _CF_SQL,
        "cross_fields_topk": _XF_SQL,
        "index_prefixes_count": _INDEX_PREFIXES_SQL,
        "match_must_not": _BM25_SQL_TEMPLATE.replace("{_TOK}", _TOK).format(
            having="""HAVING NOT EXISTS (
               SELECT 1 FROM tf t2
               WHERE t2.doc_id = tf.doc_id
                 AND t2.term = (SELECT term FROM ranked_terms WHERE r = 1)
             )"""
        ),
        "match_count": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            tf AS (SELECT doc_id, term FROM toks GROUP BY 1, 2),
            df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
            ranked_terms AS (
              SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df
            ),
            queries AS (
              SELECT 0 AS query_id, term FROM ranked_terms WHERE r = 1
              UNION ALL SELECT 1, term FROM ranked_terms WHERE r IN (2, 3)
              UNION ALL SELECT 2, term FROM ranked_terms WHERE r IN (4, 5, 6)
              UNION ALL SELECT 3, term FROM ranked_terms WHERE r IN (7, 8)
            )
            SELECT q.query_id, count(DISTINCT tf.doc_id)::BIGINT AS n_matching
            FROM queries q JOIN tf ON tf.term = q.term
            GROUP BY 1
        """,
        "terms_enum": _TERMS_ENUM_SQL,
        "prefix_count": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            tf AS (SELECT DISTINCT doc_id, term FROM toks),
            df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
            ranked_terms AS (
              SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df
            ),
            prefixes AS (
              SELECT (r - 1)::BIGINT AS query_id, substr(term, 1, 3) AS p
              FROM ranked_terms WHERE r <= 4
            )
            SELECT p.query_id, count(DISTINCT tf.doc_id)::BIGINT AS n_matching
            FROM prefixes p JOIN tf ON starts_with(tf.term, p.p)
            GROUP BY 1
        """,
        "wildcard_count": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            tf AS (SELECT DISTINCT doc_id, term FROM toks),
            df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
            ranked_terms AS (
              SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df
            ),
            pats AS (
              SELECT (r - 1)::BIGINT AS query_id,
                     substr(term, 1, 2) AS pre, right(term, 1) AS suf
              FROM ranked_terms WHERE r <= 4
            )
            SELECT p.query_id, count(DISTINCT tf.doc_id)::BIGINT AS n_matching
            FROM pats p
            JOIN tf ON starts_with(tf.term, p.pre)
                   AND ends_with(tf.term, p.suf)
                   AND len(tf.term) >= 3
            GROUP BY 1
        """,
        "regexp_count": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            tf AS (SELECT DISTINCT doc_id, term FROM toks),
            df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
            ranked_terms AS (
              SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df
            ),
            pats AS (
              SELECT (r - 1)::BIGINT AS query_id,
                     substr(term, 1, 2) || '[a-z0-9]*' || right(term, 1) AS pat
              FROM ranked_terms WHERE r <= 4
            )
            SELECT p.query_id, count(DISTINCT tf.doc_id)::BIGINT AS n_matching
            FROM pats p JOIN tf ON regexp_full_match(tf.term, p.pat)
            GROUP BY 1
        """,
        "fuzzy_count": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            tf AS (SELECT DISTINCT doc_id, term FROM toks),
            df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
            ranked_terms AS (
              SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df
            ),
            probes AS (
              SELECT (row_number() OVER (ORDER BY r) - 1)::BIGINT AS query_id,
                     substr(term, 1, len(term) - 1) AS p
              FROM ranked_terms WHERE r <= 4 AND len(term) >= 2
            )
            SELECT p.query_id, count(DISTINCT tf.doc_id)::BIGINT AS n_matching
            FROM probes p JOIN tf ON levenshtein(tf.term, p.p) <= 1
            GROUP BY 1
        """,
        "exists_count": """
            SELECT 0::BIGINT AS query_id, count(*)::BIGINT AS n_matching
            FROM documents WHERE doc_id % 7 <> 0
        """,
        "completion_suggest": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            tf AS (SELECT DISTINCT doc_id, term FROM toks),
            df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
            ranked_terms AS (
              SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df
            ),
            probes AS (
              SELECT (r - 1)::BIGINT AS query_id, substr(term, 1, 2) AS p
              FROM ranked_terms WHERE r <= 4
            ),
            cand AS (
              SELECT p.query_id, df.term AS suggestion, df.df AS freq
              FROM probes p JOIN df ON starts_with(df.term, p.p)
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY freq DESC, suggestion ASC) AS rank
              FROM cand
            )
            SELECT query_id, rank::BIGINT AS rank, suggestion, freq
            FROM ranked WHERE rank <= 5
        """,
        "term_suggest": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            tf AS (SELECT DISTINCT doc_id, term FROM toks),
            df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
            ranked_terms AS (
              SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df
            ),
            probes AS (
              SELECT (row_number() OVER (ORDER BY r) - 1)::BIGINT AS query_id,
                     substr(term, 1, len(term) - 1) AS p
              FROM ranked_terms WHERE r <= 4 AND len(term) >= 2
            ),
            cand AS (
              SELECT p.query_id, df.term AS suggestion, df.df AS freq
              FROM probes p
              JOIN df ON levenshtein(df.term, p.p) <= 1 AND df.term <> p.p
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY freq DESC, suggestion ASC) AS rank
              FROM cand
            )
            SELECT query_id, rank::BIGINT AS rank, suggestion, freq
            FROM ranked WHERE rank <= 5
        """,
        "term_suggest_popular": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            tf AS (SELECT DISTINCT doc_id, term FROM toks),
            df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
            ranked_terms AS (
              SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df
            ),
            probes AS (
              SELECT (row_number() OVER (ORDER BY r) - 1)::BIGINT AS query_id,
                     substr(term, 1, len(term) - 1) AS p
              FROM ranked_terms WHERE r <= 4 AND len(term) >= 2
              UNION ALL
              SELECT (SELECT count(*) FROM ranked_terms
                      WHERE r <= 4 AND len(term) >= 2)::BIGINT,
                     term
              FROM ranked_terms WHERE r = 4
            ),
            pdf AS (
              SELECT p.query_id, coalesce(max(df.df), 0) AS pdf
              FROM probes p LEFT JOIN df ON df.term = p.p GROUP BY 1
            ),
            cand AS (
              SELECT p.query_id, df.term AS suggestion, df.df AS freq
              FROM probes p
              JOIN pdf ON pdf.query_id = p.query_id
              JOIN df ON levenshtein(df.term, p.p) <= 1 AND df.term <> p.p
              WHERE df.df > pdf.pdf
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY freq DESC, suggestion ASC) AS rank
              FROM cand
            )
            SELECT query_id, rank::BIGINT AS rank, suggestion, freq
            FROM ranked WHERE rank <= 5
        """,
        "phrase_suggest": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            tf AS (SELECT DISTINCT doc_id, term FROM toks),
            df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
            stats AS (SELECT count(*)::DOUBLE AS n FROM documents),
            ranked_terms AS (
              SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df
            ),
            probes AS (
              SELECT (r - 1)::BIGINT AS slot,
                     substr(term, 1, len(term) - 1) AS p
              FROM ranked_terms WHERE r <= 2 AND len(term) >= 2
            ),
            cand AS (
              SELECT p.slot, df.term AS c, df.df AS f,
                     row_number() OVER (
                       PARTITION BY p.slot ORDER BY df.df DESC, df.term ASC) AS rn
              FROM probes p JOIN df ON levenshtein(df.term, p.p) <= 1
            ),
            top_cand AS (SELECT * FROM cand WHERE rn <= 5),
            orig AS (
              SELECT (SELECT p FROM probes WHERE slot = 0) || ' '
                     || (SELECT p FROM probes WHERE slot = 1) AS o
            ),
            phrases AS (
              SELECT c0.c || ' ' || c1.c AS suggestion,
                     round(ln((c0.f + 1.0) / (s.n + 1.0))
                           + ln((c1.f + 1.0) / (s.n + 1.0)), 6) AS score
              FROM top_cand c0 JOIN top_cand c1 ON c0.slot = 0 AND c1.slot = 1
              CROSS JOIN stats s
            ),
            ranked2 AS (
              SELECT suggestion, score,
                     row_number() OVER (ORDER BY score DESC, suggestion ASC) AS rank
              FROM phrases, orig WHERE suggestion <> orig.o
            )
            SELECT 0::BIGINT AS query_id, rank::BIGINT AS rank, suggestion, score
            FROM ranked2 WHERE rank <= 3
        """,
        "phrase_prefix_count": f"""
            WITH toks AS (
              SELECT doc_id, {_TOK} AS t FROM documents
            ),
            big AS (
              SELECT unnest([{{'w1': t[i], 'w2': t[i+1]}} for i in generate_series(1, len(t)-1)]) AS bg
              FROM toks WHERE len(t) >= 2
            ),
            top_bigram AS (
              SELECT bg.w1 AS w1, bg.w2 AS w2 FROM big
              GROUP BY 1, 2 ORDER BY count(*) DESC, w1 ASC, w2 ASC LIMIT 1
            ),
            probe AS (SELECT w1, substr(w2, 1, 3) AS pre FROM top_bigram)
            SELECT 0::BIGINT AS query_id, count(DISTINCT doc_id)::BIGINT AS n_matching
            FROM toks, probe
            WHERE len(t) >= 2 AND len(
              [i for i in generate_series(1, len(t) - 1)
               if t[i] = probe.w1 AND starts_with(t[i+1], probe.pre)]
            ) > 0
        """,
        "span_containing_topk": _SPAN_CONTAINING_SQL,
        "span_within_topk": _SPAN_WITHIN_SQL,
        "span_near_topk": f"""
            WITH toks AS (
              SELECT doc_id, {_TOK} AS t FROM documents
            ),
            dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM toks),
            stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
            exdocs AS (SELECT DISTINCT doc_id, unnest(t) AS term FROM toks),
            dfs AS (SELECT term, count(*)::DOUBLE AS df FROM exdocs GROUP BY 1),
            ranked AS (
              SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM dfs
            ),
            w AS (SELECT (SELECT term FROM ranked WHERE r = 1) AS w1,
                         (SELECT term FROM ranked WHERE r = 2) AS w2),
            idf AS (
              SELECT ln(1 + (s.n - d1.df + 0.5) / (d1.df + 0.5))
                   + ln(1 + (s.n - d2.df + 0.5) / (d2.df + 0.5)) AS v
              FROM w JOIN dfs d1 ON d1.term = w.w1 JOIN dfs d2 ON d2.term = w.w2
              CROSS JOIN stats s
            ),
            ptf AS (
              SELECT toks.doc_id,
                     len([i for i in generate_series(1, len(t))
                          if t[i] = w.w1 AND len([j for j in generate_series(i+1, least(i+4, len(t)))
                                                  if t[j] = w.w2]) > 0])::DOUBLE AS tf
              FROM toks, w
            ),
            scored AS (
              SELECT p.doc_id,
                     round(idf.v * p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)), 6) AS score
              FROM ptf p
              JOIN dl ON dl.doc_id = p.doc_id
              CROSS JOIN idf CROSS JOIN stats s
              WHERE p.tf > 0
            )
            SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
                   doc_id, score
            FROM scored
            ORDER BY score DESC, doc_id ASC
            LIMIT 10
        """,
        "span_multi_topk": f"""
            WITH toks AS (
              SELECT doc_id, {_TOK} AS t FROM documents
            ),
            dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM toks),
            stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
            exdocs AS (SELECT DISTINCT doc_id, unnest(t) AS term FROM toks),
            dfs AS (SELECT term, count(*)::DOUBLE AS df FROM exdocs GROUP BY 1),
            ranked AS (
              SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM dfs
            ),
            w AS (SELECT (SELECT term FROM ranked WHERE r = 1) AS w1,
                         (SELECT substr(term, 1, 3) FROM ranked WHERE r = 2) AS px),
            idf1 AS (
              SELECT ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) AS v
              FROM w JOIN dfs d ON d.term = w.w1 CROSS JOIN stats s
            ),
            idf2 AS (
              SELECT sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))) AS v
              FROM w JOIN dfs d ON starts_with(d.term, w.px) CROSS JOIN stats s
            ),
            idf AS (SELECT idf1.v + idf2.v AS v FROM idf1, idf2),
            ptf AS (
              SELECT toks.doc_id,
                     len([i for i in generate_series(1, len(t))
                          if t[i] = w.w1 AND len([j for j in generate_series(i+1, least(i+4, len(t)))
                                                  if starts_with(t[j], w.px)]) > 0])::DOUBLE AS tf
              FROM toks, w
            ),
            scored AS (
              SELECT p.doc_id,
                     round(idf.v * p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)), 6) AS score
              FROM ptf p
              JOIN dl ON dl.doc_id = p.doc_id
              CROSS JOIN idf CROSS JOIN stats s
              WHERE p.tf > 0
            )
            SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
                   doc_id, score
            FROM scored
            ORDER BY score DESC, doc_id ASC
            LIMIT 10
        """,
        "span_or_topk": f"""
            WITH tl AS (
              SELECT doc_id, {_TOK} AS t FROM documents
            ),
            dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM tl),
            stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
            toks AS (SELECT doc_id, unnest(t) AS term FROM tl),
            tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2),
            df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
            ranked AS (
              SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df
            ),
            w AS (SELECT (SELECT term FROM ranked WHERE r = 3) AS w1,
                         (SELECT term FROM ranked WHERE r = 5) AS w2),
            idf AS (
              SELECT ln(1 + (s.n - d1.df + 0.5) / (d1.df + 0.5))
                   + ln(1 + (s.n - d2.df + 0.5) / (d2.df + 0.5)) AS v
              FROM w JOIN df d1 ON d1.term = w.w1 JOIN df d2 ON d2.term = w.w2
              CROSS JOIN stats s
            ),
            utf AS (
              SELECT tf.doc_id, sum(tf.tf) AS tf
              FROM w JOIN tf ON tf.term IN (w.w1, w.w2) GROUP BY 1
            ),
            scored AS (
              SELECT u.doc_id,
                     round(idf.v * u.tf * 2.2 / (u.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)), 6) AS score
              FROM utf u JOIN dl ON dl.doc_id = u.doc_id
              CROSS JOIN idf CROSS JOIN stats s
            )
            SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
                   doc_id, score
            FROM scored
            ORDER BY score DESC, doc_id ASC
            LIMIT 10
        """,
        "span_not_topk": f"""
            WITH tl AS (
              SELECT doc_id, {_TOK} AS t FROM documents
            ),
            dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM tl),
            stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
            exdocs AS (SELECT DISTINCT doc_id, unnest(t) AS term FROM tl),
            dfs AS (SELECT term, count(*)::DOUBLE AS df FROM exdocs GROUP BY 1),
            ranked AS (
              SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM dfs
            ),
            w AS (SELECT (SELECT term FROM ranked WHERE r = 1) AS w1,
                         (SELECT term FROM ranked WHERE r = 2) AS w2),
            idf AS (
              SELECT ln(1 + (s.n - d1.df + 0.5) / (d1.df + 0.5)) AS v
              FROM w JOIN dfs d1 ON d1.term = w.w1 CROSS JOIN stats s
            ),
            ptf AS (
              SELECT tl.doc_id,
                     len([i for i in generate_series(1, len(t))
                          if t[i] = w.w1 AND len([j for j in generate_series(greatest(1, i - 2), least(len(t), i + 2))
                                                  if t[j] = w.w2]) = 0])::DOUBLE AS tf
              FROM tl, w
            ),
            scored AS (
              SELECT p.doc_id,
                     round(idf.v * p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)), 6) AS score
              FROM ptf p JOIN dl ON dl.doc_id = p.doc_id
              CROSS JOIN idf CROSS JOIN stats s
              WHERE p.tf > 0
            )
            SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
                   doc_id, score
            FROM scored
            ORDER BY score DESC, doc_id ASC
            LIMIT 10
        """,
        "query_string_topk": f"""
            WITH toks AS (
              SELECT doc_id, {_TOK} AS t FROM documents
            ),
            dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM toks),
            stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
            tok_rows AS (SELECT doc_id, unnest(t) AS term FROM toks),
            tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok_rows GROUP BY 1, 2),
            df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
            ranked_terms AS (
              SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df
            ),
            w AS (SELECT (SELECT term FROM ranked_terms WHERE r = 3) AS tmust,
                         (SELECT term FROM ranked_terms WHERE r = 6) AS tshould),
            big AS (
              SELECT unnest([{{'w1': t[i], 'w2': t[i+1]}} for i in generate_series(1, len(t)-1)]) AS bg
              FROM toks WHERE len(t) >= 2
            ),
            top_bigram AS (
              SELECT bg.w1 AS w1, bg.w2 AS w2 FROM big
              GROUP BY 1, 2 ORDER BY count(*) DESC, w1 ASC, w2 ASC LIMIT 1
            ),
            pidf AS (
              SELECT ln(1 + (s.n - d1.df + 0.5) / (d1.df + 0.5))
                   + ln(1 + (s.n - d2.df + 0.5) / (d2.df + 0.5)) AS v
              FROM top_bigram tb
              JOIN df d1 ON d1.term = tb.w1
              JOIN df d2 ON d2.term = tb.w2
              CROSS JOIN stats s
            ),
            ptf AS (
              SELECT toks.doc_id,
                     len([i for i in generate_series(1, len(t)-1)
                          if t[i] = tb.w1 AND t[i+1] = tb.w2])::DOUBLE AS tf
              FROM toks, top_bigram tb
            ),
            phrase_score AS (
              SELECT p.doc_id,
                     round(pidf.v * p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)), 6) AS ps
              FROM ptf p JOIN dl ON dl.doc_id = p.doc_id
              CROSS JOIN pidf CROSS JOIN stats s
              WHERE p.tf > 0
            ),
            must_score AS (
              SELECT tf.doc_id,
                     round(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                           * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)), 6) AS ms
              FROM w JOIN tf ON tf.term = w.tmust JOIN df ON df.term = w.tmust
              JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
            ),
            should_score AS (
              SELECT tf.doc_id,
                     round(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                           * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)), 6) AS ss
              FROM w JOIN tf ON tf.term = w.tshould JOIN df ON df.term = w.tshould
              JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
            ),
            scored AS (
              SELECT m.doc_id, round(m.ms + p.ps + coalesce(s2.ss, 0), 6) AS score
              FROM must_score m
              JOIN phrase_score p USING (doc_id)
              LEFT JOIN should_score s2 USING (doc_id)
            )
            SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
                   doc_id, score
            FROM scored
            ORDER BY score DESC, doc_id ASC
            LIMIT 10
        """,
        "intervals_topk": f"""
            WITH toks AS (
              SELECT doc_id, {_TOK} AS t FROM documents
            ),
            dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM toks),
            stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
            exdocs AS (SELECT DISTINCT doc_id, unnest(t) AS term FROM toks),
            dfs AS (SELECT term, count(*)::DOUBLE AS df FROM exdocs GROUP BY 1),
            ranked AS (
              SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM dfs
            ),
            w AS (SELECT (SELECT term FROM ranked WHERE r = 1) AS w1,
                         (SELECT term FROM ranked WHERE r = 2) AS w2),
            idf AS (
              SELECT ln(1 + (s.n - d1.df + 0.5) / (d1.df + 0.5))
                   + ln(1 + (s.n - d2.df + 0.5) / (d2.df + 0.5)) AS v
              FROM w JOIN dfs d1 ON d1.term = w.w1 JOIN dfs d2 ON d2.term = w.w2
              CROSS JOIN stats s
            ),
            -- unordered max_gaps=3: an anchor end i is valid when the
            -- OTHER term occurs within the last 4 positions (inclusive)
            ptf AS (
              SELECT toks.doc_id,
                     len([i for i in generate_series(1, len(t))
                          if (t[i] = w.w1 AND len([j for j in generate_series(greatest(1, i - 4), i)
                                                   if t[j] = w.w2]) > 0)
                          OR (t[i] = w.w2 AND len([j for j in generate_series(greatest(1, i - 4), i)
                                                   if t[j] = w.w1]) > 0)])::DOUBLE AS tf
              FROM toks, w
            ),
            scored AS (
              SELECT p.doc_id,
                     round(idf.v * p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)), 6) AS score
              FROM ptf p
              JOIN dl ON dl.doc_id = p.doc_id
              CROSS JOIN idf CROSS JOIN stats s
              WHERE p.tf > 0
            )
            SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
                   doc_id, score
            FROM scored
            ORDER BY score DESC, doc_id ASC
            LIMIT 10
        """,
        "span_first_topk": f"""
            WITH toks AS (
              SELECT doc_id, {_TOK} AS t FROM documents
            ),
            dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM toks),
            stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
            exdocs AS (SELECT DISTINCT doc_id, unnest(t) AS term FROM toks),
            dfs AS (SELECT term, count(*)::DOUBLE AS df FROM exdocs GROUP BY 1),
            ranked AS (
              SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM dfs
            ),
            w AS (SELECT (SELECT term FROM ranked WHERE r = 1) AS w1,
                         (SELECT term FROM ranked WHERE r = 2) AS w2),
            idf AS (
              SELECT ln(1 + (s.n - d1.df + 0.5) / (d1.df + 0.5))
                   + ln(1 + (s.n - d2.df + 0.5) / (d2.df + 0.5)) AS v
              FROM w JOIN dfs d1 ON d1.term = w.w1 JOIN dfs d2 ON d2.term = w.w2
              CROSS JOIN stats s
            ),
            ptf AS (
              SELECT toks.doc_id,
                     len([i for i in generate_series(1, len(t))
                          if t[i] = w.w1 AND len([j for j in generate_series(i+1, least(i+4, len(t)))
                                                  if t[j] = w.w2 AND j <= 8]) > 0])::DOUBLE AS tf
              FROM toks, w
            ),
            scored AS (
              SELECT p.doc_id,
                     round(idf.v * p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)), 6) AS score
              FROM ptf p
              JOIN dl ON dl.doc_id = p.doc_id
              CROSS JOIN idf CROSS JOIN stats s
              WHERE p.tf > 0
            )
            SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
                   doc_id, score
            FROM scored
            ORDER BY score DESC, doc_id ASC
            LIMIT 10
        """,
        "phrase_topk": f"""
            WITH toks AS (
              SELECT doc_id, {_TOK} AS t FROM documents
            ),
            dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM toks),
            stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
            big AS (
              SELECT unnest([{{'w1': t[i], 'w2': t[i+1]}} for i in generate_series(1, len(t)-1)]) AS bg
              FROM toks WHERE len(t) >= 2
            ),
            top_bigram AS (
              SELECT bg.w1 AS w1, bg.w2 AS w2 FROM big
              GROUP BY 1, 2 ORDER BY count(*) DESC, w1 ASC, w2 ASC LIMIT 1
            ),
            exdocs AS (
              SELECT DISTINCT doc_id, unnest(t) AS term FROM toks
            ),
            dfs AS (SELECT term, count(*)::DOUBLE AS df FROM exdocs GROUP BY 1),
            idf AS (
              SELECT ln(1 + (s.n - d1.df + 0.5) / (d1.df + 0.5))
                   + ln(1 + (s.n - d2.df + 0.5) / (d2.df + 0.5)) AS v
              FROM top_bigram tb
              JOIN dfs d1 ON d1.term = tb.w1
              JOIN dfs d2 ON d2.term = tb.w2
              CROSS JOIN stats s
            ),
            ptf AS (
              SELECT toks.doc_id,
                     len([i for i in generate_series(1, len(t)-1)
                          if t[i] = tb.w1 AND t[i+1] = tb.w2])::DOUBLE AS tf
              FROM toks, top_bigram tb
            ),
            scored AS (
              SELECT p.doc_id,
                     round(idf.v * p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)), 6) AS score
              FROM ptf p
              JOIN dl ON dl.doc_id = p.doc_id
              CROSS JOIN idf CROSS JOIN stats s
              WHERE p.tf > 0
            )
            SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
                   doc_id, score
            FROM scored
            ORDER BY score DESC, doc_id ASC
            LIMIT 10
        """,
        "match_lang_agg": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            tf AS (SELECT doc_id, term FROM toks GROUP BY 1, 2),
            df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
            ranked_terms AS (
              SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df
            ),
            queries AS (
              SELECT 0 AS query_id, term FROM ranked_terms WHERE r = 1
              UNION ALL SELECT 1, term FROM ranked_terms WHERE r IN (2, 3)
              UNION ALL SELECT 2, term FROM ranked_terms WHERE r IN (4, 5, 6)
              UNION ALL SELECT 3, term FROM ranked_terms WHERE r IN (7, 8)
            ),
            matches AS (
              SELECT DISTINCT q.query_id, tf.doc_id
              FROM queries q JOIN tf ON tf.term = q.term
            )
            SELECT m.query_id, d.lang AS value, count(*)::BIGINT AS n_docs
            FROM matches m JOIN documents d ON d.doc_id = m.doc_id
            GROUP BY 1, 2
        """,
        "match_source_agg": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            tf AS (SELECT doc_id, term FROM toks GROUP BY 1, 2),
            df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
            ranked_terms AS (
              SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM df
            ),
            queries AS (
              SELECT 0 AS query_id, term FROM ranked_terms WHERE r = 1
              UNION ALL SELECT 1, term FROM ranked_terms WHERE r IN (2, 3)
              UNION ALL SELECT 2, term FROM ranked_terms WHERE r IN (4, 5, 6)
              UNION ALL SELECT 3, term FROM ranked_terms WHERE r IN (7, 8)
            ),
            matches AS (
              SELECT DISTINCT q.query_id, tf.doc_id
              FROM queries q JOIN tf ON tf.term = q.term
            )
            SELECT m.query_id, d.source AS value, count(*)::BIGINT AS n_docs
            FROM matches m JOIN documents d ON d.doc_id = m.doc_id
            GROUP BY 1, 2
        """,
        "mget_docs": """
            WITH want(key) AS (
              VALUES ('5'), ('50'), ('123'), ('404'), ('999999999')
            )
            SELECT w.key,
                   coalesce(d.doc_id, -1)::BIGINT AS doc_id,
                   d.lang AS lang,
                   (d.doc_id IS NOT NULL) AS found
            FROM want w LEFT JOIN documents d ON CAST(d.doc_id AS VARCHAR) = w.key
        """,
        "analyze_api": f"""
            SELECT doc_id,
                   (generate_subscripts({_TOK}, 1) - 1)::BIGINT AS position,
                   unnest({_TOK}) AS token
            FROM documents WHERE doc_id < 3 ORDER BY 1, 2
        """,
        "mget_fields": """
            WITH want(key) AS (
              VALUES ('0'), ('7'), ('42'), ('999999999')
            )
            SELECT w.key,
                   coalesce(d.doc_id, -1)::BIGINT AS doc_id,
                   d.lang AS lang,
                   (d.doc_id IS NOT NULL) AS found,
                   d.source AS source,
                   d.n_chars::DOUBLE AS n_chars
            FROM want w LEFT JOIN documents d ON CAST(d.doc_id AS VARCHAR) = w.key
        """,
        "lineitem_agg": """
            SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS n_rows,
                   sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))::DOUBLE / 100.0 AS sum_qty,
                   sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))::DOUBLE / 100.0 AS sum_price
            FROM lineitem GROUP BY 1, 2
        """,
        "topk_orders": """
            SELECT rank, o_orderkey, o_totalprice FROM (
              SELECT o_orderkey, o_totalprice, row_number() OVER (
                ORDER BY o_totalprice DESC, o_orderkey ASC
              ) AS rank FROM orders
            ) WHERE rank <= 10
        """,
        "ngram_jaccard": f"""
            WITH toks AS (
              SELECT doc_id, {_TOK} AS t FROM documents
            ),
            sh AS (
              SELECT doc_id, list_distinct(
                CASE WHEN len(t) = 0 THEN []
                     WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                     ELSE [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                           for i in generate_series(1, len(t) - 2)]
                END) AS shs
              FROM toks
            ),
            sizes AS (SELECT doc_id, len(shs) AS n FROM sh),
            ex AS (SELECT doc_id, unnest(shs) AS s FROM sh),
            ok_sh AS (SELECT s FROM ex GROUP BY s HAVING count(*) BETWEEN 2 AND 200),
            pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::DOUBLE AS inter
              FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
              JOIN ok_sh ON ok_sh.s = a.s
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   round(inter / (sa.n + sb.n - inter), 6) AS jaccard
            FROM pairs
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE round(inter / (sa.n + sb.n - inter), 6) >= 0.01
        """,
        # connected components over the >=0.2 n-gram-Jaccard pair graph:
        # recursive reachability closure, cluster_id = min reachable node
        # (mirrors the large-star/small-star fixpoint exactly)
        "dedup_clusters": f"""
            WITH RECURSIVE toks AS (
              SELECT doc_id, {_TOK} AS t FROM documents
            ),
            sh AS (
              SELECT doc_id, list_distinct(
                CASE WHEN len(t) = 0 THEN []
                     WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                     ELSE [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                           for i in generate_series(1, len(t) - 2)]
                END) AS shs
              FROM toks
            ),
            sizes AS (SELECT doc_id, len(shs) AS n FROM sh),
            ex AS (SELECT doc_id, unnest(shs) AS s FROM sh),
            ok_sh AS (SELECT s FROM ex GROUP BY s HAVING count(*) BETWEEN 2 AND 200),
            pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::DOUBLE AS inter
              FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
              JOIN ok_sh ON ok_sh.s = a.s
              GROUP BY 1, 2
            ),
            jp AS (
              SELECT doc_a, doc_b
              FROM pairs
              JOIN sizes sa ON sa.doc_id = doc_a
              JOIN sizes sb ON sb.doc_id = doc_b
              WHERE round(inter / (sa.n + sb.n - inter), 6) >= 0.2
            ),
            edges AS (
              SELECT doc_a AS u, doc_b AS v FROM jp
              UNION ALL SELECT doc_b, doc_a FROM jp
            ),
            walk(node, reach) AS (
              SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
              UNION
              SELECT w.node, e.v FROM walk w JOIN edges e ON e.u = w.reach
            )
            SELECT d.doc_id,
                   coalesce(l.cluster_id, d.doc_id)::BIGINT AS cluster_id
            FROM documents d
            LEFT JOIN (
              SELECT node AS doc_id, min(reach) AS cluster_id FROM walk GROUP BY 1
            ) l USING (doc_id)
        """,
        "mix_epochs": """
            WITH w AS (
              SELECT doc_id, source,
                     CASE source WHEN 'src0' THEN 2.3
                                 WHEN 'src1' THEN 0.4 ELSE 1.0 END AS wt
              FROM documents
            ),
            k AS (
              SELECT doc_id, source, wt, CAST(floor(wt) AS BIGINT) AS kf,
                     CAST(round((wt - floor(wt)) * 1000000) AS BIGINT) AS thr
              FROM w
            ),
            full_rep AS (
              SELECT doc_id, source, unnest(generate_series(0, kf - 1)) AS epoch
              FROM k WHERE kf >= 1
            ),
            frac AS (
              SELECT doc_id, source, kf AS epoch FROM k
              WHERE md5_number_lower(doc_id::VARCHAR || '|' || kf::VARCHAR)
                    % 1000000 < thr
            )
            SELECT doc_id, source, epoch::BIGINT AS epoch FROM full_rep
            UNION ALL
            SELECT doc_id, source, epoch::BIGINT FROM frac
            ORDER BY 1, 3
        """,
        "pack_sequences": f"""
            WITH t AS (
              SELECT doc_id, len({_TOK})::BIGINT AS n_tokens FROM documents
            ),
            c AS (
              SELECT doc_id, n_tokens,
                     coalesce(sum(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0)::BIGINT AS start_offset
              FROM t
            )
            SELECT doc_id, n_tokens, start_offset,
                   (start_offset // 256)::BIGINT AS first_seq,
                   ((start_offset + n_tokens - 1) // 256)::BIGINT AS last_seq
            FROM c WHERE n_tokens > 0 ORDER BY 1
        """,
        "lm_score": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            cnt AS (SELECT term, count(*)::DOUBLE AS c FROM toks GROUP BY 1),
            tot AS (SELECT count(*)::DOUBLE AS n FROM toks)
            SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
                   round(avg(ln(c.c / tot.n)), 6) AS lm_logprob
            FROM toks t JOIN cnt c USING (term) CROSS JOIN tot
            GROUP BY 1 ORDER BY 1
        """,
        "quality_classifier": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            feats AS (
              SELECT doc_id, count(*)::BIGINT AS n_tokens,
                     avg(len(term)) AS mean_len,
                     avg(CASE WHEN term IN ({_STOP_LIST_SQL})
                         THEN 1.0 ELSE 0.0 END) AS stop_frac,
                     avg(CASE WHEN regexp_full_match(term, '[0-9]+')
                         THEN 1.0 ELSE 0.0 END) AS digit_frac
              FROM toks GROUP BY 1
            )
            SELECT doc_id, n_tokens,
                   round(1.0 / (1.0 + exp(-(-2.0 + 0.6 * ln(1.0 + n_tokens)
                         + 0.1 * mean_len + 2.0 * stop_frac
                         - 3.0 * digit_frac))), 6) AS quality,
                   round(1.0 / (1.0 + exp(-(-2.0 + 0.6 * ln(1.0 + n_tokens)
                         + 0.1 * mean_len + 2.0 * stop_frac
                         - 3.0 * digit_frac))), 6) >= 0.5 AS keep
            FROM feats ORDER BY 1
        """,
        "top_quality_fraction": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            feats AS (
              SELECT doc_id, count(*)::BIGINT AS n_tokens,
                     avg(len(term)) AS mean_len,
                     avg(CASE WHEN term IN ({_STOP_LIST_SQL})
                         THEN 1.0 ELSE 0.0 END) AS stop_frac,
                     avg(CASE WHEN regexp_full_match(term, '[0-9]+')
                         THEN 1.0 ELSE 0.0 END) AS digit_frac
              FROM toks GROUP BY 1
            ),
            scored AS (
              SELECT doc_id, n_tokens,
                     round(1.0 / (1.0 + exp(-(-2.0 + 0.6 * ln(1.0 + n_tokens)
                           + 0.1 * mean_len + 2.0 * stop_frac
                           - 3.0 * digit_frac))), 6) AS quality
              FROM feats
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                ORDER BY quality DESC, doc_id ASC) AS rn,
                count(*) OVER () AS n
              FROM scored
            )
            SELECT doc_id, n_tokens, quality FROM ranked
            WHERE rn <= ceil(0.3 * n) ORDER BY quality DESC, doc_id ASC
        """,
        "lm_quality_buckets": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            cnt AS (SELECT term, count(*)::DOUBLE AS c FROM toks GROUP BY 1),
            tot AS (SELECT count(*)::DOUBLE AS n FROM toks),
            lp AS (
              SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
                     round(avg(ln(c.c / tot.n)), 6) AS lm_logprob
              FROM toks t JOIN cnt c USING (term) CROSS JOIN tot
              GROUP BY 1
            )
            SELECT doc_id, n_tokens, lm_logprob,
                   CASE WHEN lm_logprob > -3.42 THEN 'head'
                        WHEN lm_logprob > -3.55 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM lp ORDER BY 1
        """,
        "tfidf_top_terms": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2),
            df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
            n AS (SELECT count(*)::DOUBLE AS n FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.term, round(tf.tf * ln(n.n / df.df), 6) AS tfidf
              FROM tf JOIN df USING (term) CROSS JOIN n
            ),
            topk AS (
              SELECT doc_id, term, tfidf,
                     row_number() OVER (
                       PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
                     ) AS rank
              FROM scored
            )
            SELECT doc_id, term, rank::BIGINT AS rank, tfidf
            FROM topk WHERE rank <= 5
        """,
        "doc_token_counts": f"SELECT doc_id, len({_TOK})::BIGINT AS n_tokens FROM documents",
        "term_df": f"""
            SELECT term, count(*)::BIGINT AS df FROM (
              SELECT DISTINCT doc_id, term FROM (
                SELECT doc_id, unnest({_TOK}) AS term FROM documents
              )
            ) GROUP BY term
        """,
        "exact_dedup": """
            SELECT min(doc_id)::BIGINT AS doc_id, count(*)::BIGINT AS n_copies
            FROM documents GROUP BY text
        """,
        "canonical_urls": _CANON_URLS_SQL,
        "url_dedup": _URL_DEDUP_SQL,
        "domain_blocklist_counts": _DOMAIN_COUNTS_SQL,
        "host_quality_filter": _HOST_QUALITY_SQL,
        "url_quality": _URL_QUALITY_SQL,
        "ingest_pipeline": _INGEST_SQL,
        "simulate_pipeline": _SIMULATE_SQL,
        "lww_events": """
            SELECT user_id, event_id, event_type, value FROM (
              SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC
              ) AS rn FROM events
            ) WHERE rn = 1
        """,
        "cumulative_cardinality_agg": _CUM_CARD_SQL,
        "props_json_agg": """
            SELECT event_type,
                   count(*)::BIGINT AS n_events,
                   sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
                   round(sum(json_extract(props, '$.k')::BIGINT)::DOUBLE / count(*), 6) AS avg_k
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "window_events": """
            SELECT epoch(date_trunc('hour', ts))::BIGINT AS window_start_s,
                   event_type,
                   count(*)::BIGINT AS n_events,
                   round(sum(value), 6) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "sessionize_events": """
            WITH e AS (
              SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events
            ),
            flags AS (
              SELECT user_id, event_id, tsu,
                     CASE WHEN lag(tsu) OVER w IS NULL
                            OR tsu - lag(tsu) OVER w > 1800000000
                          THEN 1 ELSE 0 END AS new_s
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
            ),
            sess AS (
              SELECT user_id, tsu,
                     sum(new_s) OVER (
                       PARTITION BY user_id ORDER BY tsu, event_id
                       ROWS UNBOUNDED PRECEDING
                     ) AS session_seq
              FROM flags
            )
            SELECT user_id, session_seq::BIGINT AS session_seq,
                   count(*)::BIGINT AS n_events,
                   min(tsu)::BIGINT AS start_us, max(tsu)::BIGINT AS end_us
            FROM sess GROUP BY 1, 2
        """,
        "broadcast_lookup": """
            SELECT c_mktsegment, count(*)::BIGINT AS n_orders,
                   sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::DOUBLE / 100.0
                     AS total_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1
        """,
        # sq8_rescore re-ranks its quantized candidates with exact
        # cosine, so its oracle IS the exact top-k (coverage pytest'd)
        "ann_sq8_rescore_topk": """
            WITH q AS (
              SELECT vec_id AS query_vec_id, embedding AS qe
              FROM embeddings WHERE vec_id < 3
            ),
            sims AS (
              SELECT q.query_vec_id, e.vec_id,
                     round(list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]), 6) AS sim
              FROM q CROSS JOIN embeddings e
            ),
            ranked AS (
              SELECT query_vec_id, vec_id, sim, row_number() OVER (
                PARTITION BY query_vec_id ORDER BY sim DESC, vec_id ASC
              ) AS rank FROM sims
            )
            SELECT query_vec_id, rank::BIGINT AS rank, vec_id, sim
            FROM ranked WHERE rank <= 10
        """,
        # pq_rescore also re-ranks with exact cosine -> same exact oracle
        "ann_pq_rescore_topk": """
            WITH q AS (
              SELECT vec_id AS query_vec_id, embedding AS qe
              FROM embeddings WHERE vec_id < 3
            ),
            sims AS (
              SELECT q.query_vec_id, e.vec_id,
                     round(list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]), 6) AS sim
              FROM q CROSS JOIN embeddings e
            ),
            ranked AS (
              SELECT query_vec_id, vec_id, sim, row_number() OVER (
                PARTITION BY query_vec_id ORDER BY sim DESC, vec_id ASC
              ) AS rank FROM sims
            )
            SELECT query_vec_id, rank::BIGINT AS rank, vec_id, sim
            FROM ranked WHERE rank <= 10
        """,
        "ann_cosine_topk": """
            WITH q AS (
              SELECT vec_id AS query_vec_id, embedding AS qe
              FROM embeddings WHERE vec_id < 3
            ),
            sims AS (
              SELECT q.query_vec_id, e.vec_id,
                     round(list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]), 6) AS sim
              FROM q CROSS JOIN embeddings e
            ),
            ranked AS (
              SELECT query_vec_id, vec_id, sim, row_number() OVER (
                PARTITION BY query_vec_id ORDER BY sim DESC, vec_id ASC
              ) AS rank FROM sims
            )
            SELECT query_vec_id, rank::BIGINT AS rank, vec_id, sim
            FROM ranked WHERE rank <= 10
        """,
        "global_shuffle": """
            SELECT doc_id,
                   (row_number() OVER (
                      ORDER BY md5_number_lower('shuf:' || doc_id)
                               % 4611686018427387904, doc_id
                    ) - 1)::BIGINT AS shuffle_pos
            FROM documents
        """,
        "line_dedup": """
            WITH tl AS (
              SELECT doc_id, {_TOK} AS t FROM documents
            ),
            pos AS (
              SELECT doc_id, unnest(t) AS term, generate_subscripts(t, 1) AS p FROM tl
            ),
            lines AS (
              SELECT doc_id, ((p - 1) // 12)::BIGINT AS pos,
                     string_agg(term, ' ' ORDER BY p) AS line
              FROM pos GROUP BY 1, 2
            ),
            ranked AS (
              SELECT doc_id, pos, line,
                     row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rnk
              FROM lines
            ),
            kept_agg AS (
              SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
                     count(*)::BIGINT AS n_kept
              FROM ranked WHERE rnk = 1 GROUP BY 1
            ),
            drop_agg AS (
              SELECT doc_id, count(*)::BIGINT AS n_dropped
              FROM ranked WHERE rnk > 1 GROUP BY 1
            )
            SELECT d.doc_id,
                   coalesce(k.text, '') AS text,
                   coalesce(k.n_kept, 0)::BIGINT AS n_kept,
                   coalesce(dr.n_dropped, 0)::BIGINT AS n_dropped
            FROM documents d
            LEFT JOIN kept_agg k USING (doc_id)
            LEFT JOIN drop_agg dr USING (doc_id)
        """.replace("{_TOK}", _TOK),
        "curriculum_order": """
            SELECT doc_id,
                   (row_number() OVER (
                      ORDER BY n_chars DESC, doc_id ASC
                    ) - 1)::BIGINT AS curriculum_pos
            FROM documents
        """,
        "cap_per_source": """
            WITH ranked AS (
              SELECT doc_id, source, n_chars, row_number() OVER (
                PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
              ) AS group_rank
              FROM documents
            )
            SELECT doc_id, source, n_chars, group_rank::BIGINT AS group_rank
            FROM ranked WHERE group_rank <= 10
        """,
        "doc_fingerprint": "SELECT doc_id, md5(text) AS fp FROM documents",
        "distinct_users": "SELECT count(DISTINCT user_id)::BIGINT AS distinct_users FROM events",
        "heavy_hitters_event_types": """
            SELECT event_type AS value, count(*)::BIGINT AS approx_count
            FROM events GROUP BY 1 ORDER BY approx_count DESC, value ASC LIMIT 5
        """,
        "embedding_neardup_exact": """
            WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000)
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.2
        """,
        "lang_stats": f"""
            WITH t AS (
              SELECT lang, n_chars, len({_TOK})::BIGINT AS n_tokens FROM documents
            )
            SELECT lang, count(*)::BIGINT AS n_docs,
                   round(sum(n_chars)::DOUBLE / count(*), 6) AS avg_chars,
                   round(sum(n_tokens)::DOUBLE / count(*), 6) AS avg_tokens
            FROM t GROUP BY 1
        """,
        "doc_quality": f"""
            WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents)
            SELECT doc_id, len(toks)::BIGINT AS n_tokens,
                   round(CASE WHEN len(toks) > 0 THEN
                     len(list_filter(toks, x -> x IN
                       ('the','a','and','of','to','in','is','it')))::DOUBLE / len(toks)
                     ELSE 0 END, 6) AS stop_ratio,
                   round(CASE WHEN len(toks) > 0 THEN
                     list_sum(list_transform(toks, x -> len(x)))::DOUBLE / len(toks)
                     ELSE 0 END, 6) AS mean_token_len
            FROM t
        """,
        # 4-gram eval-leakage scan; n-gram strings are space-joined
        # tokens on both sides (list_reduce || ' ' == ' '.join)
        "decontaminated_corpus": f"""
            WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            grams AS (
              SELECT doc_id,
                     unnest([list_reduce(toks[i:i+3], (a, b) -> a || ' ' || b)
                             for i in generate_series(1, len(toks)-3)]) AS g
              FROM t WHERE len(toks) >= 4
            ),
            dg AS (SELECT DISTINCT doc_id, g FROM grams),
            bench AS (SELECT DISTINCT g FROM dg WHERE doc_id % 50 = 0),
            hits AS (
              SELECT dg.doc_id, count(*)::BIGINT AS n_shared
              FROM dg JOIN bench USING (g)
              WHERE dg.doc_id % 50 <> 0 GROUP BY 1
            )
            SELECT d.doc_id, coalesce(h.n_shared, 0)::BIGINT AS n_shared
            FROM documents d LEFT JOIN hits h USING (doc_id)
            WHERE d.doc_id % 50 <> 0 AND coalesce(h.n_shared, 0) = 0
            ORDER BY d.doc_id
        """,
        "contamination": f"""
            WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            grams AS (
              SELECT doc_id,
                     unnest([list_reduce(toks[i:i+3], (a, b) -> a || ' ' || b)
                             for i in generate_series(1, len(toks)-3)]) AS g
              FROM t WHERE len(toks) >= 4
            ),
            dg AS (SELECT DISTINCT doc_id, g FROM grams),
            bench AS (SELECT DISTINCT g FROM dg WHERE doc_id % 50 = 0),
            hits AS (
              SELECT dg.doc_id, count(*)::BIGINT AS n_shared
              FROM dg JOIN bench USING (g)
              WHERE dg.doc_id % 50 <> 0 GROUP BY 1
            )
            SELECT d.doc_id, coalesce(h.n_shared, 0)::BIGINT AS n_shared,
                   (coalesce(h.n_shared, 0) > 0)::BIGINT AS contaminated
            FROM documents d LEFT JOIN hits h USING (doc_id)
            WHERE d.doc_id % 50 <> 0
            ORDER BY d.doc_id
        """,
        # chunking: 1-based list slicing; keep a window iff it's the first
        # OR the previous window did not already reach the doc end
        "chunk_documents": f"""
            WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            wins AS (
              SELECT doc_id, toks, len(toks) AS n, unnest(generate_series(1, len(toks), 48)) AS s
              FROM t WHERE len(toks) > 0
            ),
            kept AS (
              SELECT doc_id, toks[s:s+63] AS w, s,
                     row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS chunk_idx
              FROM wins WHERE s = 1 OR (s - 48) + 64 - 1 < n
            )
            SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
                   len(w)::BIGINT AS n_tokens,
                   md5(list_reduce(w, (a, b) -> a || ' ' || b)) AS chunk_md5
            FROM kept ORDER BY doc_id, chunk_idx
        """,
        # PII scan: same injected-PII transform + RE2 patterns as the Ray
        # side; md5 of the doubly-redacted text compares byte-exactly
        "pii_scan": r"""
            WITH t AS (
              SELECT doc_id,
                     text
                     || CASE WHEN doc_id % 5 = 0
                        THEN ' contact' || doc_id::VARCHAR || '@example.com'
                        ELSE '' END
                     || CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.0.1' ELSE '' END
                     AS t2
              FROM documents
            )
            SELECT doc_id,
                   len(regexp_extract_all(t2, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))::BIGINT AS n_emails,
                   len(regexp_extract_all(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ips,
                   md5(regexp_replace(
                     regexp_replace(t2, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
                     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g')) AS redacted_md5
            FROM t ORDER BY doc_id
        """,
        # hash-threshold sampling: md5_number_lower(doc_id::VARCHAR) is
        # the exact engine hash (SimHashStage contract)
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE md5_number_lower(doc_id::VARCHAR) % 1000000 <
                  CASE lang WHEN 'en' THEN 300000 WHEN 'de' THEN 500000
                       ELSE 100000 END
            ORDER BY doc_id
        """,
        "train_holdout": """
            SELECT doc_id,
                   CASE WHEN md5_number_lower(doc_id::VARCHAR) % 1000000 < 100000
                        THEN 'holdout' ELSE 'train' END AS split
            FROM documents ORDER BY doc_id
        """,
        # Gopher rules on ROUNDED values both sides so the keep cut is
        # bit-identical; docs with <2 tokens coalesce bigram frac to 0
        # within-doc duplicate 5-grams: occurrence fraction + coverage
        "dup_ngram_stats": f"""
            WITH toks AS (SELECT doc_id, {_TOK} AS t FROM documents),
            grams AS (
              SELECT doc_id, i, array_to_string(t[i:i+1], ' ') AS key
              FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
              WHERE len(t) >= 2
            ),
            cnt AS (SELECT doc_id, key, count(*) AS c FROM grams GROUP BY 1, 2),
            dupw AS (
              SELECT g.doc_id, g.i
              FROM grams g JOIN cnt USING (doc_id, key) WHERE cnt.c >= 2
            ),
            cover AS (
              SELECT DISTINCT d.doc_id, d.i + u.u AS p
              FROM dupw d, UNNEST(generate_series(0, 1)) AS u(u)
            ),
            base AS (SELECT doc_id, len(t)::BIGINT AS n_words,
                            greatest(len(t) - 1, 0)::BIGINT AS n_windows FROM toks),
            dd AS (SELECT doc_id, count(*)::BIGINT AS nd FROM dupw GROUP BY 1),
            cc AS (SELECT doc_id, count(*)::BIGINT AS nc FROM cover GROUP BY 1)
            SELECT b.doc_id, b.n_words, b.n_windows,
                   round(coalesce(dd.nd, 0) / greatest(b.n_windows, 1), 6) AS dup_ngram_frac,
                   round(coalesce(cc.nc, 0) / greatest(b.n_words, 1), 6) AS dup_cover_frac
            FROM base b LEFT JOIN dd USING (doc_id) LEFT JOIN cc USING (doc_id)
            ORDER BY 1
        """,
        # cross-doc duplicate 8-gram spans (df >= 2 over distinct docs)
        "cross_doc_ngram_dups": f"""
            WITH toks AS (SELECT doc_id, {_TOK} AS t FROM documents),
            grams AS (
              SELECT doc_id, array_to_string(t[i:i+7], ' ') AS key
              FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS g(i)
              WHERE len(t) >= 8
            ),
            kd AS (SELECT key, count(DISTINCT doc_id) AS df FROM grams GROUP BY 1)
            SELECT g.doc_id, count(*)::BIGINT AS n_windows,
                   count(*) FILTER (WHERE kd.df >= 2)::BIGINT AS n_dup_windows,
                   round(count(*) FILTER (WHERE kd.df >= 2) / count(*), 6) AS dup_frac
            FROM grams g JOIN kd USING (key)
            GROUP BY 1 ORDER BY 1
        """,
        "gopher_quality": f"""
            WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            words AS (SELECT doc_id, unnest(toks) AS w FROM t),
            base AS (
              SELECT doc_id, count(*)::BIGINT AS n_words,
                     sum(len(w))::DOUBLE AS total_chars
              FROM words GROUP BY 1
            ),
            wtop AS (
              SELECT doc_id, c FROM (
                SELECT doc_id, c, row_number() OVER (
                  PARTITION BY doc_id ORDER BY c DESC, w ASC) AS rn
                FROM (SELECT doc_id, w, count(*)::BIGINT AS c FROM words GROUP BY 1, 2)
              ) WHERE rn = 1
            ),
            big AS (
              SELECT doc_id,
                     unnest([{{'w1': toks[i], 'w2': toks[i+1]}}
                             for i in generate_series(1, len(toks)-1)]) AS bg
              FROM t WHERE len(toks) >= 2
            ),
            btop AS (
              SELECT doc_id, c, w1, w2 FROM (
                SELECT doc_id, c, w1, w2, row_number() OVER (
                  PARTITION BY doc_id ORDER BY c DESC, w1 ASC, w2 ASC) AS rn
                FROM (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2,
                             count(*)::BIGINT AS c FROM big GROUP BY 1, 2, 3)
              ) WHERE rn = 1
            ),
            m AS (
              SELECT b.doc_id, b.n_words,
                     round(b.total_chars / b.n_words, 6) AS mean_word_len,
                     round(wt.c / (b.n_words * 1.0), 6) AS max_word_rep_frac,
                     coalesce(
                       round(bt.c * (len(bt.w1) + len(bt.w2)) / b.total_chars, 6),
                       0.0) AS top2gram_frac
              FROM base b
              JOIN wtop wt USING (doc_id)
              LEFT JOIN btop bt USING (doc_id)
            )
            SELECT doc_id, n_words, mean_word_len, max_word_rep_frac, top2gram_frac,
                   (n_words BETWEEN 20 AND 1000
                    AND mean_word_len BETWEEN 2.0 AND 10.0
                    AND top2gram_frac <= 0.20
                    AND max_word_rep_frac <= 0.30)::BIGINT AS keep
            FROM m
        """,
        # simhash's term hash is md5-based PRECISELY so DuckDB can replay
        # it: md5_number_lower(t) == little-endian uint64 of md5 bytes
        # [8:16] (SimHashStage contract).  Bit votes are exact integer
        # sums; the uint64 simhash is wrapped to BIGINT on both sides.
        "simhash": f"""
            WITH toks AS (
              SELECT doc_id, md5_number_lower(term) AS h, count(*)::BIGINT AS cnt
              FROM (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
              GROUP BY doc_id, term
            ),
            bits(bit) AS (SELECT unnest(range(64))),
            votes AS (
              SELECT doc_id, bit,
                     sum(CASE WHEN ((h >> bit) & 1) = 1 THEN cnt ELSE -cnt END) AS v
              FROM toks CROSS JOIN bits GROUP BY 1, 2
            ),
            sh AS (
              SELECT doc_id,
                     sum(CASE WHEN v > 0 THEN (1::HUGEINT << bit) ELSE 0::HUGEINT END) AS s
              FROM votes GROUP BY 1
            )
            SELECT d.doc_id,
                   (CASE WHEN coalesce(sh.s, 0) >= 9223372036854775808::HUGEINT
                         THEN coalesce(sh.s, 0) - 18446744073709551616::HUGEINT
                         ELSE coalesce(sh.s, 0) END)::BIGINT AS simhash
            FROM documents d LEFT JOIN sh ON sh.doc_id = d.doc_id
        """,
        # lang_id scores are EXACT integers (LangIdStage.int_profiles:
        # count * LCM/total), so the SQL argmax reproduces the Python
        # argmax bit-for-bit; ties break by seed priority on both sides.
        "lang_id": _lang_id_oracle_sql(),
        # minhash_dups, embedding_neardup, pages_pipeline, media_features,
        # ann_ivf_topk, approx_distinct_users, actions_*: not
        # SQL-expressible (approximate sketches / self-synthesized corpus /
        # binary payloads / wire formats) -> rows-only check + pytest
        # oracles (recall-vs-exact, planted pairs, codec round-trips).
    }
