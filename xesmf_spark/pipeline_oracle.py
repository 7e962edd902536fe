"""DuckDB oracle SQL mirroring xesmf_spark.pipeline (text operators).

Same determinism contract as oracle.py: every hash derives from md5
(identical across engines), all modular arithmetic is reduced before
multiplication, list/array semantics are matched construct-by-construct
(Spark ``slice``/``transform``/``aggregate`` <-> DuckDB list slicing /
``list_transform`` / ``list_sum``). The SQL is the SPEC of each
operator; the Spark side is the distributed implementation.
"""

from __future__ import annotations

from xesmf_spark.pipeline import (
    BANDS,
    K_HASHES,
    MAX_LSH_BUCKET,
    MAX_SHINGLE_DF,
    P,
    SHINGLE,
    STOPWORDS,
    _a,
    _b,
)

ROUND = 7

_STOPLIST = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

#: normalized text + token list per doc (input CTE must provide
#: ``docs(doc_id, text, ...)``)
NORM_CTE = """
norm AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS ntext
  FROM docs
),
toks AS (
  SELECT doc_id, string_split(ntext, ' ') AS t FROM norm
)"""

#: distinct token 3-gram shingles per doc (needs toks)
SHINGLE_CTE = f"""
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(greatest(len(t) - {SHINGLE}, 0) + 1),
                       i -> array_to_string(t[i + 1 : i + {SHINGLE}], ' '))) AS sh_set
  FROM toks
)"""

#: exploded shingle hashes (needs sh)
SHINGLE_HASH_CTE = f"""
shx AS (
  SELECT doc_id, unnest(sh_set) AS shingle FROM sh
),
shh AS (
  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {P} AS hb FROM shx
)"""


def _docs_cte(with_dups: bool) -> str:
    """Base ``docs`` CTE: the documents table, optionally UNIONed with
    deterministic perturbations that guarantee duplicate structure:
    - doc_id %% 7 == 0: exact copy (new id +200000)
    - doc_id %% 11 == 0: upper-cased + extra whitespace (normalizes equal)
    - doc_id %% 5 == 0: last 3 tokens dropped (near-dup, id +100000)
    """
    if not with_dups:
        return "docs AS (SELECT doc_id, text FROM documents)"
    return """docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000, text FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 300000, upper(text) || '  ' FROM documents WHERE doc_id % 11 = 0
  UNION ALL
  SELECT doc_id + 100000,
         array_to_string(
           (string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '))
             [1 : greatest(len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) - 3, 1)],
           ' ')
  FROM documents WHERE doc_id % 5 = 0
)"""


def exact_dedup_sql() -> str:
    return f"""
WITH
{_docs_cte(True)},
{NORM_CTE}
SELECT md5(ntext) AS content_key,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS n_docs
FROM norm
GROUP BY content_key
"""


def _sig_select() -> str:
    """Signatures as a pure projection over the shingle-hash list —
    mirrors pipeline._sig_array (array_min over transform)."""
    mins = ",\n         ".join(
        f"list_min(list_transform(hs, h -> ({_a(i)} * h + {_b(i)}) % {P})) AS sig_{i}"
        for i in range(K_HASHES)
    )
    return f"""
shhl AS (
  SELECT doc_id,
         list_transform(sh_set, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % {P}) AS hs
  FROM sh
),
sigs AS (
  SELECT doc_id,
         {mins}
  FROM shhl
)"""


def _bands_cte() -> str:
    rows = K_HASHES // BANDS
    selects = []
    for b in range(BANDS):
        parts = ", ".join(f"sig_{b * rows + r}" for r in range(rows))
        selects.append(
            f"SELECT doc_id, {b} AS band, md5(concat_ws('_', {parts})) AS bh FROM sigs"
        )
    return "buckets AS (\n  " + "\n  UNION ALL\n  ".join(selects) + "\n)"


def _pair_ctes(threshold: float) -> str:
    """CTE chain ending in ``pairs(id_a, id_b, jac)`` — the verified
    near-dup pairs at ``threshold`` (shared by the pair query and the
    connected-components grouping query)."""
    return f"""{_docs_cte(True)},
{_pair_chain(threshold)}"""


def _pair_chain(threshold: float) -> str:
    """The pair chain WITHOUT the base docs CTE — composable over any
    upstream ``docs(doc_id, text)`` definition (used by the end-to-end
    clean-corpus oracle, which interposes exact dedup first)."""
    return f"""{NORM_CTE},
{SHINGLE_CTE},
{SHINGLE_HASH_CTE},
{_sig_select()},
{_bands_cte()},
bsz AS (SELECT band, bh, COUNT(*) AS bucket_n FROM buckets GROUP BY band, bh),
bkept AS (
  SELECT b.doc_id, b.band, b.bh
  FROM buckets b JOIN bsz z ON b.band = z.band AND b.bh = z.bh
  WHERE z.bucket_n <= {MAX_LSH_BUCKET}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bkept a JOIN bkept b ON a.band = b.band AND a.bh = b.bh
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, len(sh_set) AS n_sh FROM sh),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN shx ea ON c.id_a = ea.doc_id
  JOIN shx eb ON c.id_b = eb.doc_id AND ea.shingle = eb.shingle
  GROUP BY c.id_a, c.id_b
),
pairs AS (
  SELECT i.id_a, i.id_b,
         CAST(i.n_inter AS DOUBLE)
         / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE) AS jac
  FROM inter i
  JOIN sizes sa ON i.id_a = sa.doc_id
  JOIN sizes sb ON i.id_b = sb.doc_id
  WHERE CAST(i.n_inter AS DOUBLE)
        / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE) >= {threshold}
)"""


def minhash_dedup_sql(threshold: float = 0.5) -> str:
    return f"""
WITH
{_pair_ctes(threshold)}
SELECT id_a, id_b, ROUND(jac, {ROUND}) AS jaccard FROM pairs
"""


def decontaminate_fuzzy_sql(threshold: float = 0.5) -> str:
    """Mirrors pipeline.decontaminate_fuzzy over the planted corpus
    with eval split = base docs having doc_id %% 7 == 0: the shared
    shingle/sig/bucket chain runs once over ALL docs (per-doc pure
    functions — identical computed per side or together), the skew
    valve counts COMBINED bucket occupancy (same as the engine's
    union-of-sides count since train + eval = docs), and the candidate
    join pairs train-tagged with eval-tagged bucket rows."""
    ev = "(doc_id < 100000 AND doc_id % 7 = 0)"
    return f"""
WITH
{_docs_cte(True)},
{NORM_CTE},
{SHINGLE_CTE},
{SHINGLE_HASH_CTE},
{_sig_select()},
{_bands_cte()},
bsz AS (SELECT band, bh, COUNT(*) AS bucket_n FROM buckets GROUP BY band, bh),
bkept AS (
  SELECT b.doc_id, b.band, b.bh
  FROM buckets b JOIN bsz z ON b.band = z.band AND b.bh = z.bh
  WHERE z.bucket_n <= {MAX_LSH_BUCKET}
),
cand AS (
  SELECT DISTINCT t.doc_id AS doc_id, e.doc_id AS eval_id
  FROM bkept t JOIN bkept e ON t.band = e.band AND t.bh = e.bh
  WHERE NOT (t.doc_id < 100000 AND t.doc_id % 7 = 0)
    AND {ev.replace("doc_id", "e.doc_id")}
),
sizes AS (SELECT doc_id, len(sh_set) AS n_sh FROM sh),
inter AS (
  SELECT c.doc_id, c.eval_id, COUNT(*) AS n_inter
  FROM cand c
  JOIN shx st ON c.doc_id = st.doc_id
  JOIN shx se ON c.eval_id = se.doc_id AND st.shingle = se.shingle
  GROUP BY c.doc_id, c.eval_id
),
pairs AS (
  SELECT i.doc_id, i.eval_id,
         CAST(i.n_inter AS DOUBLE)
         / CAST(st.n_sh + se.n_sh - i.n_inter AS DOUBLE) AS jac
  FROM inter i
  JOIN sizes st ON i.doc_id = st.doc_id
  JOIN sizes se ON i.eval_id = se.doc_id
)
SELECT doc_id, eval_id, ROUND(jac, {ROUND}) AS jaccard
FROM pairs WHERE jac >= {threshold}
"""


def dedup_groups_sql(threshold: float = 0.5) -> str:
    """Transitive keep verdicts over the near-dup pair graph: a
    recursive CTE computes, per node, every reachable node's id; the
    component's keep_id is the MIN. Docs in no pair keep themselves.
    Mirrors pipeline.dedup_groups (min-label propagation)."""
    return f"""
WITH RECURSIVE
{_pair_ctes(threshold)},
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT src AS node, src AS lbl FROM edges
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node
),
comp AS (SELECT node, MIN(lbl) AS keep FROM reach GROUP BY node)
SELECT d.doc_id, COALESCE(c.keep, d.doc_id) AS keep_id
FROM docs d LEFT JOIN comp c ON d.doc_id = c.node
"""


def grouped_split_sql(threshold: float = 0.5) -> str:
    """Mirrors pipeline_split_grouped: the dedup_groups recursive-CTE
    component replay, then the assign_split md5-threshold routing on
    the GROUP key (0.8/0.1/0.1 => 'cccccccc'/'e6666666' hex bounds),
    aggregated per split."""
    return f"""
WITH RECURSIVE
{_pair_ctes(threshold)},
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT src AS node, src AS lbl FROM edges
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node
),
comp AS (SELECT node, MIN(lbl) AS keep FROM reach GROUP BY node),
verdicts AS (
  SELECT d.doc_id, length(d.text) AS n_chars,
         COALESCE(c.keep, d.doc_id) AS keep_id
  FROM docs d LEFT JOIN comp c ON d.doc_id = c.node
),
assigned AS (
  SELECT keep_id, n_chars,
         CASE WHEN substr(md5(CAST(keep_id AS VARCHAR)), 1, 8) < 'cccccccc'
                THEN 'train'
              WHEN substr(md5(CAST(keep_id AS VARCHAR)), 1, 8) < 'e6666666'
                THEN 'val'
              ELSE 'test' END AS split
  FROM verdicts
)
SELECT split, COUNT(*) AS n_docs,
       COUNT(DISTINCT keep_id) AS n_groups,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM assigned GROUP BY split
"""


def _simhash_ctes(with_dups: bool, bits: int = 32) -> str:
    """CTE chain ending in ``sim(doc_id, simhash)`` — mirrors
    pipeline.simhash's SWAR-packed pure projection: one wide-hash list
    per doc, one popcount-pack sum per 4-bit group (spread-multiply
    places bits 0..3 at positions 0/15/30/45, so one sum yields four
    15-bit counters), then a flat per-doc extraction (vote sum > 0 <=>
    2*S_b > n). Every value CAST to BIGINT (DuckDB SUM/list_sum yield
    HUGEINT, which the typed hasher digests differently); docs with
    >32767 distinct tokens are NULL both sides."""
    MUL = 1 | (1 << 14) | (1 << 28) | (1 << 42)
    MSK = 1 | (1 << 15) | (1 << 30) | (1 << 45)
    pack_cols = []
    for g in range(0, bits, 4):
        width = min(4, bits - g)
        gm = (1 << width) - 1
        pack_cols.append(
            f"CAST(list_sum(list_transform(hs,"
            f" h -> (((h >> {g}) & {gm}) * {MUL}) & {MSK}))"
            f" AS BIGINT) AS pack_{g // 4}"
        )
    terms = "\n     + ".join(
        f"CASE WHEN ((pack_{b // 4} >> {15 * (b % 4)}) & 32767) * 2 > n"
        f" THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(bits)
    )
    return f"""{_docs_cte(with_dups)},
{NORM_CTE},
hashed AS (
  SELECT doc_id,
         list_transform(list_distinct(t),
                        tok -> ('0x' || substr(md5(tok), 1, 15))::BIGINT) AS hs,
         len(list_distinct(t)) AS n
  FROM toks
),
packed AS (
  SELECT doc_id, n, {", ".join(pack_cols)}
  FROM hashed
),
sim AS (
  SELECT doc_id,
         CASE WHEN n <= 32767 THEN CAST({terms} AS BIGINT) END AS simhash
  FROM packed
)"""


def simhash_sql(bits: int = 32) -> str:
    return f"""
WITH
{_simhash_ctes(False, bits)}
SELECT doc_id, simhash FROM sim
"""


def simhash_pairs_sql(
    bits: int = 32,
    radius: int = 3,
    n_bands: int = 4,
    max_bucket: int = 1000,
) -> str:
    """Mirrors pipeline.simhash_pairs: band the fingerprints, drop
    oversized buckets (same valve), equi-join candidates, verify with
    the exact popcount-of-XOR Hamming distance. Because
    n_bands >= radius + 1, the banded join is EXACT at the radius
    (pigeonhole) — the oracle states the banding explicitly so the
    valve semantics match the engine's bucket drops bit-for-bit."""
    width = bits // n_bands
    mask = (1 << width) - 1
    return f"""
WITH
{_simhash_ctes(True, bits)},
bands AS (
  SELECT doc_id, simhash, CAST(g AS INT) AS band,
         (simhash >> (CAST(g AS INT) * {width})) & {mask} AS bh
  FROM sim CROSS JOIN range({n_bands}) AS t(g)
  WHERE simhash IS NOT NULL
),
ok AS (
  SELECT band, bh FROM bands GROUP BY band, bh
  HAVING COUNT(*) <= {max_bucket}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM bands a
  JOIN ok USING (band, bh)
  JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(sh_a, sh_b)) <= {radius}
"""


def nb_quality_sql(micro: int = 1_000_000) -> str:
    """Mirrors pipeline.nb_quality_score: add-one multinomial NB over
    the planted NB_TRAIN_DOCS corpus (embedded as a VALUES table — one
    source of truth with the Spark query), per-token log-likelihood
    ratios floored to micro-nats per class BEFORE the BIGINT doc sum,
    unseen-token and prior constants from the same 1-row totals."""
    from xesmf_spark.pipeline import NB_TRAIN_DOCS

    vals = ",\n         ".join(f"({y}, '{t}')" for y, t in NB_TRAIN_DOCS)
    return f"""
WITH train(label, ttext) AS (
  VALUES {vals}
),
ttok AS (
  SELECT label,
         unnest(string_split(lower(trim(regexp_replace(ttext, '\\s+', ' ', 'g'))), ' '))
           AS token
  FROM train
),
cnts AS (
  SELECT token,
         SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS c0
  FROM ttok WHERE token != '' GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS t1, CAST(SUM(c0) AS BIGINT) AS t0,
         COUNT(*) AS V
  FROM cnts
),
pri AS (
  SELECT SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS n0
  FROM train
),
llr AS (
  SELECT token,
         CAST(FLOOR({micro} * LN(CAST(c1 + 1 AS DOUBLE) / CAST(t1 + V AS DOUBLE))) AS BIGINT)
       - CAST(FLOOR({micro} * LN(CAST(c0 + 1 AS DOUBLE) / CAST(t0 + V AS DOUBLE))) AS BIGINT)
           AS w
  FROM cnts, tot
),
consts AS (
  SELECT CAST(FLOOR({micro} * LN(CAST(1 AS DOUBLE) / CAST(t1 + V AS DOUBLE))) AS BIGINT)
       - CAST(FLOOR({micro} * LN(CAST(1 AS DOUBLE) / CAST(t0 + V AS DOUBLE))) AS BIGINT)
           AS u,
         CAST(FLOOR({micro} * LN(CAST(n1 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))) AS BIGINT)
       - CAST(FLOOR({micro} * LN(CAST(n0 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))) AS BIGINT)
           AS p
  FROM tot, pri
),
stok AS (
  SELECT doc_id,
         unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '))
           AS token
  FROM documents
),
sc AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         CAST(SUM(COALESCE(w, (SELECT u FROM consts))) AS BIGINT) AS s
  FROM stok LEFT JOIN llr USING (token)
  WHERE token != ''
  GROUP BY 1
)
SELECT doc_id, n_tokens,
       CAST(s + (SELECT p FROM consts) AS BIGINT) AS score_micro,
       CAST(CASE WHEN s + (SELECT p FROM consts) > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS pred_label
FROM sc
"""


def unigram_logprob_sql(micro: int = 1_000_000) -> str:
    """Mirrors pipeline.unigram_logprob_score: per-token log-probs
    floored to integer micro-nats before the (exact BIGINT) per-doc
    sum; the only doubles are the identical-operand cnt/total division,
    one ln() per distinct value, and the final mean division."""
    return f"""
WITH
{_docs_cte(False)},
{NORM_CTE},
tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
freq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM freq),
lp AS (
  SELECT doc_id,
         CAST(FLOOR({micro} * LN(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)))
              AS BIGINT) AS lp_micro
  FROM tok JOIN freq USING (token), tot
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(lp_micro) AS BIGINT) AS sum_lp_micro,
       CAST(SUM(lp_micro) AS DOUBLE) / ({micro}.0 * COUNT(*)) AS avg_logprob
FROM lp
GROUP BY doc_id
"""


def _gram_ctes(src: str, prefix: str, n: int) -> str:
    """norm/tokens/distinct-n-gram CTE chain over an aliased doc source
    (same normalization + short-doc convention as SHINGLE_CTE)."""
    return f"""{prefix}_norm AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS ntext
  FROM {src}
),
{prefix}_toks AS (SELECT doc_id, string_split(ntext, ' ') AS t FROM {prefix}_norm),
{prefix}_grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(greatest(len(t) - {n}, 0) + 1),
                i -> array_to_string(t[i + 1 : i + {n}], ' ')))) AS ngram
  FROM {prefix}_toks
)"""


def decontaminate_sql(n: int = 13) -> str:
    """Mirrors pipeline.decontaminate on the planted-duplicates corpus:
    eval = base docs with doc_id %% 7 == 0, train = the rest; distinct
    eval grams equi-joined against exploded train grams; all-integer
    counts + one exact final division."""
    return f"""
WITH
{_docs_cte(True)},
ev0 AS (SELECT doc_id, text FROM docs WHERE doc_id < 100000 AND doc_id % 7 = 0),
tr0 AS (SELECT doc_id, text FROM docs WHERE NOT (doc_id < 100000 AND doc_id % 7 = 0)),
{_gram_ctes('ev0', 'ev', n)},
{_gram_ctes('tr0', 'tr', n)},
evg AS (SELECT DISTINCT ngram FROM ev_grams),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_doc_ngrams
  FROM tr_grams GROUP BY doc_id
),
hits AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated_ngrams
  FROM tr_grams JOIN evg USING (ngram) GROUP BY doc_id
)
SELECT h.doc_id, n_contaminated_ngrams, n_doc_ngrams,
       CAST(n_contaminated_ngrams AS DOUBLE) / CAST(n_doc_ngrams AS DOUBLE)
         AS contaminated_frac
FROM hits h JOIN per_doc USING (doc_id)
"""


def span_dedup_sql(n: int = 13) -> str:
    """Mirrors pipeline.dedup_spans on the planted-duplicates corpus:
    positioned n-grams (end clamped for the short-doc whole-text
    convention), keeper = min doc id per repeated gram, non-keeper
    occurrences merged gaps-and-islands (explicit ROWS frames), removed
    token indexes exploded from the islands, cleaned text re-joined by
    ordered string_agg. All-integer counts; md5 over the cleaned text
    (md5('') for fully-scrubbed docs) closes the value hash."""
    return f"""
WITH
{_docs_cte(True)},
{NORM_CTE},
grams AS (
  SELECT doc_id, i AS pos0,
         array_to_string(t[i + 1 : i + {n}], ' ') AS ngram,
         least(i + {n} - 1, len(t) - 1) AS e
  FROM toks, UNNEST(range(greatest(len(t) - {n}, 0) + 1)) AS u(i)
),
rep AS (
  SELECT ngram, MIN(doc_id) AS keeper
  FROM grams GROUP BY ngram
  HAVING COUNT(DISTINCT doc_id) >= 2
),
spans AS (
  SELECT g.doc_id, g.pos0 AS s, g.e
  FROM grams g JOIN rep r ON g.ngram = r.ngram
  WHERE g.doc_id <> r.keeper
),
marked AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS brk
  FROM spans
),
isl AS (
  SELECT doc_id, s, e,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM marked
),
merged AS (
  SELECT doc_id, island, MIN(s) AS S, MAX(e) AS E
  FROM isl GROUP BY doc_id, island
),
removed AS (
  SELECT DISTINCT m.doc_id, u.i
  FROM merged m, UNNEST(range(m.S, m.E + 1)) AS u(i)
),
tok_idx AS (
  SELECT doc_id, i, t[CAST(i AS INT) + 1] AS tok
  FROM toks, UNNEST(range(len(t))) AS u2(i)
),
kept AS (
  SELECT k.doc_id, k.i, k.tok
  FROM tok_idx k LEFT JOIN removed r ON k.doc_id = r.doc_id AND k.i = r.i
  WHERE r.i IS NULL
),
cleaned AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS ctext
  FROM kept GROUP BY doc_id
),
stats AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_islands,
         CAST(SUM(E - S + 1) AS BIGINT) AS n_removed
  FROM merged GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(COALESCE(s.n_islands, 0) AS BIGINT) AS n_islands,
       CAST(COALESCE(s.n_removed, 0) AS BIGINT) AS n_removed,
       md5(COALESCE(c.ctext, '')) AS cleaned_key
FROM toks t
LEFT JOIN stats s ON t.doc_id = s.doc_id
LEFT JOIN cleaned c ON t.doc_id = c.doc_id
"""


def span_dedup_multilevel_sql(
    levels: tuple[tuple[int, int], ...] = ((13, 8), (26, 4), (52, 2)),
    exact_run: int | None = None,
    rare_quote: bool = False,
) -> str:
    """Mirrors pipeline.dedup_spans(levels=...) on the long-quote
    planted corpus (_longquote_cte): per (gram length, min_docs) level
    its own grams/rep/spans CTE chain (upper levels skip docs shorter
    than the level — the whole-text convention applies at the LOWEST
    level only), spans unioned + per-start MAX(e), then the same
    gaps-and-islands merge / token removal / string_agg rebuild as
    span_dedup_sql.

    ``exact_run`` extends the chain with the ExactSubstr longest-run
    CTEs (r13 verdict task): support-2 lowest-level grams keyed to
    their keeper's first occurrence, chained along one (doc, keeper,
    diagonal) at consecutive positions, maximal runs >= exact_run
    tokens emitted as spans."""
    levels = tuple(sorted(levels))
    blocks, span_sels = [], []
    for i, (nl, md) in enumerate(levels):
        where = "" if i == 0 else f"\n  WHERE len(t) >= {nl}"
        blocks.append(
            f"""grams_{nl} AS (
  SELECT doc_id, i AS pos0,
         array_to_string(t[i + 1 : i + {nl}], ' ') AS ngram,
         least(i + {nl} - 1, len(t) - 1) AS e
  FROM toks, UNNEST(range(greatest(len(t) - {nl}, 0) + 1)) AS u(i){where}
),
rep_{nl} AS (
  SELECT ngram, MIN(doc_id) AS keeper
  FROM grams_{nl} GROUP BY ngram
  HAVING COUNT(DISTINCT doc_id) >= {md}
),
spans_{nl} AS (
  SELECT g.doc_id, g.pos0 AS s, g.e
  FROM grams_{nl} g JOIN rep_{nl} r ON g.ngram = r.ngram
  WHERE g.doc_id <> r.keeper
)"""
        )
        span_sels.append(f"SELECT * FROM spans_{nl}")
    if exact_run is not None:
        n0 = levels[0][0]
        blocks.append(
            f"""xrep AS (
  SELECT ngram, MIN(doc_id) AS keeper
  FROM grams_{n0} GROUP BY ngram
  HAVING COUNT(DISTINCT doc_id) >= 2
),
xkpos AS (
  SELECT g.ngram, MIN(g.pos0) AS kpos
  FROM grams_{n0} g JOIN xrep r ON g.ngram = r.ngram AND g.doc_id = r.keeper
  GROUP BY g.ngram
),
xmatch AS (
  SELECT g.doc_id, r.keeper, g.pos0, g.e, g.pos0 - k.kpos AS diag
  FROM grams_{n0} g
  JOIN xrep r ON g.ngram = r.ngram
  JOIN xkpos k ON g.ngram = k.ngram
  WHERE g.doc_id <> r.keeper
),
xmark AS (
  SELECT doc_id, keeper, diag, pos0, e,
         CASE WHEN pos0 > COALESCE(LAG(pos0) OVER (
                PARTITION BY doc_id, keeper, diag ORDER BY pos0), -2) + 1
              THEN 1 ELSE 0 END AS brk
  FROM xmatch
),
xrun AS (
  SELECT doc_id, keeper, diag, pos0, e,
         SUM(brk) OVER (PARTITION BY doc_id, keeper, diag ORDER BY pos0
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run
  FROM xmark
),
xspans AS (
  SELECT doc_id, MIN(pos0) AS s, MAX(e) AS e
  FROM xrun GROUP BY doc_id, keeper, diag, run
  HAVING MAX(e) - MIN(pos0) + 1 >= {exact_run}
)"""
        )
        span_sels.append("SELECT * FROM xspans")
    level_ctes = ",\n".join(blocks)
    union = "\n  UNION ALL\n  ".join(span_sels)
    return f"""
WITH
{_longquote_cte(rare_quote)},
{NORM_CTE},
{level_ctes},
spans AS (
  SELECT doc_id, s, MAX(e) AS e
  FROM ({union})
  GROUP BY doc_id, s
),
marked AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS brk
  FROM spans
),
isl AS (
  SELECT doc_id, s, e,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM marked
),
merged AS (
  SELECT doc_id, island, MIN(s) AS S, MAX(e) AS E
  FROM isl GROUP BY doc_id, island
),
removed AS (
  SELECT DISTINCT m.doc_id, u.i
  FROM merged m, UNNEST(range(m.S, m.E + 1)) AS u(i)
),
tok_idx AS (
  SELECT doc_id, i, t[CAST(i AS INT) + 1] AS tok
  FROM toks, UNNEST(range(len(t))) AS u2(i)
),
kept AS (
  SELECT k.doc_id, k.i, k.tok
  FROM tok_idx k LEFT JOIN removed r ON k.doc_id = r.doc_id AND k.i = r.i
  WHERE r.i IS NULL
),
cleaned AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS ctext
  FROM kept GROUP BY doc_id
),
stats AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_islands,
         CAST(SUM(E - S + 1) AS BIGINT) AS n_removed
  FROM merged GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(COALESCE(s.n_islands, 0) AS BIGINT) AS n_islands,
       CAST(COALESCE(s.n_removed, 0) AS BIGINT) AS n_removed,
       md5(COALESCE(c.ctext, '')) AS cleaned_key
FROM toks t
LEFT JOIN stats s ON t.doc_id = s.doc_id
LEFT JOIN cleaned c ON t.doc_id = c.doc_id
"""


def winnowing_sql(
    k: int = 8, w: int = 8, min_shared: int = 4, max_df: int = MAX_SHINGLE_DF,
    min_containment_milli: int = 500,
) -> str:
    """Mirrors pipeline.winnowing_overlap_pairs on the planted-dups
    corpus: char k-gram md5 hashes, window-of-w rightmost-min selection
    via the SAME packed key ``hb·2^20 + (2^20−1−pos)`` MIN, df-valved
    pair join, exact containment milli."""
    return f"""
WITH
{_docs_cte(True)},
norm AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS nt
  FROM docs WHERE length(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) > 0
),
g AS (
  SELECT doc_id, i AS pos0, greatest(length(nt) - {k}, 0) AS lmax,
         substr(nt, CAST(i AS INT) + 1, {k}) AS gram
  FROM norm, UNNEST(range(greatest(length(nt) - {k}, 0) + 1)) AS u(i)
),
h AS (
  SELECT doc_id, pos0, lmax,
         (('0x' || substr(md5(gram), 1, 15))::BIGINT % {P}) * 1048576
           + (1048575 - pos0) AS key
  FROM g
),
wins AS (
  SELECT doc_id, pos0 + r0 AS p, MIN(key) AS key
  FROM h, UNNEST(range({w})) AS rr(r0)
  WHERE pos0 + r0 <= lmax AND (pos0 + r0 >= {w} - 1 OR pos0 + r0 = lmax)
  GROUP BY doc_id, pos0 + r0
),
fp AS (SELECT DISTINCT doc_id, key // 1048576 AS fp_hash FROM wins),
sizes AS (SELECT doc_id, COUNT(*) AS n_fp FROM fp GROUP BY 1),
rare AS (
  SELECT fp.doc_id, fp.fp_hash FROM fp
  JOIN (SELECT fp_hash FROM fp GROUP BY fp_hash
        HAVING COUNT(DISTINCT doc_id) <= {max_df}) ok USING (fp_hash)
),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(COUNT(DISTINCT a.fp_hash) AS BIGINT) AS n_shared
  FROM rare a JOIN rare b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING COUNT(DISTINCT a.fp_hash) >= {min_shared}
)
SELECT id_a, id_b, n_shared,
       CAST((1000 * n_shared) // least(sa.n_fp, sb.n_fp) AS BIGINT)
         AS containment_milli
FROM inter
JOIN sizes sa ON inter.id_a = sa.doc_id
JOIN sizes sb ON inter.id_b = sb.doc_id
WHERE (1000 * n_shared) // least(sa.n_fp, sb.n_fp) >= {min_containment_milli}
"""


def query_likelihood_sql(
    terms: tuple[str, ...] = ("data", "join", "merge"),
    mu: int = 2000,
    k: int = 10,
    micro: int = 1_000_000,
) -> str:
    """Mirrors search.query_likelihood_topk: Dirichlet-smoothed QL with
    per-term micro-nat floors of single-BIGINT ln args (numerator and
    denominator floored separately, exactly as the engine does)."""
    vals = ", ".join(f"('{t}')" for t in sorted(set(terms)))
    return f"""
WITH
{_docs_cte(False)},
{NORM_CTE},
tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS doc_len FROM toks),
tt AS (SELECT CAST(SUM(len(t)) AS BIGINT) AS T FROM toks),
q(term) AS (VALUES {vals}),
cf AS (
  SELECT q.term, CAST(COUNT(tok.term) AS BIGINT) AS cf
  FROM q LEFT JOIN tok ON tok.term = q.term GROUP BY 1
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term IN (SELECT term FROM q) GROUP BY 1, 2
),
scored AS (
  SELECT l.doc_id, l.doc_len,
         CAST(FLOOR({micro} * LN(CAST(COALESCE(tf.tf, 0) * tt.T
                                      + {mu} * cf.cf AS DOUBLE))) AS BIGINT)
       - CAST(FLOOR({micro} * LN(CAST(tt.T * (l.doc_len + {mu})
                                      AS DOUBLE))) AS BIGINT) AS lp
  FROM lens l CROSS JOIN tt CROSS JOIN cf
  LEFT JOIN tf ON tf.doc_id = l.doc_id AND tf.term = cf.term
)
SELECT doc_id, doc_len AS n_tokens, CAST(SUM(lp) AS BIGINT) AS score_micro
FROM scored GROUP BY 1, 2
ORDER BY score_micro DESC, doc_id
LIMIT {k}
"""


def rake_sql(max_phrase_len: int = 4, topk: int = 3) -> str:
    """Mirrors pipeline.rake_keyphrases: stopword/non-alnum delimited
    candidate-phrase runs, doc-local (1000·degree) div freq word
    scores, per-phrase sums, deterministic (score DESC, first_pos)
    top-k."""
    return f"""
WITH
{_docs_cte(False)},
{NORM_CTE},
tok AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos, t[CAST(i AS INT) + 1] AS tok
  FROM toks, UNNEST(range(len(t))) AS u(i)
),
fl AS (
  SELECT doc_id, pos, tok,
         (tok IN {_STOPLIST.replace('[', '(').replace(']', ')')}
          OR NOT regexp_matches(tok, '^[a-z0-9]+$') OR tok = '') AS is_delim
  FROM tok
),
br AS (
  SELECT doc_id, pos, tok, is_delim,
         CASE WHEN NOT is_delim AND COALESCE(LAG(is_delim) OVER
                (PARTITION BY doc_id ORDER BY pos), true)
              THEN 1 ELSE 0 END AS brk
  FROM fl
),
rn AS (
  SELECT doc_id, pos, tok, is_delim,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS run
  FROM br
),
mem AS (SELECT doc_id, run, pos, tok FROM rn WHERE NOT is_delim),
ph AS (
  SELECT doc_id, run, string_agg(tok, ' ' ORDER BY pos) AS phrase,
         COUNT(*) AS n_words, MIN(pos) AS first_pos
  FROM mem GROUP BY 1, 2 HAVING COUNT(*) <= {max_phrase_len}
),
mem2 AS (SELECT mem.* FROM mem JOIN ph USING (doc_id, run)),
ws AS (
  SELECT m.doc_id, m.tok,
         CAST((1000 * SUM(p.n_words)) // COUNT(*) AS BIGINT) AS wscore
  FROM mem2 m JOIN ph p USING (doc_id, run) GROUP BY 1, 2
),
sc AS (
  SELECT m.doc_id, m.run, CAST(SUM(ws.wscore) AS BIGINT) AS score_milli
  FROM mem2 m JOIN ws ON ws.doc_id = m.doc_id AND ws.tok = m.tok
  GROUP BY 1, 2
),
rk AS (
  SELECT ph.doc_id, ph.phrase, ph.n_words, sc.score_milli, ph.first_pos,
         ROW_NUMBER() OVER (PARTITION BY ph.doc_id
                            ORDER BY sc.score_milli DESC, ph.first_pos) AS rk
  FROM ph JOIN sc USING (doc_id, run)
)
SELECT doc_id, phrase, CAST(n_words AS BIGINT) AS n_words, score_milli,
       CAST(first_pos AS BIGINT) AS first_pos
FROM rk WHERE rk <= {topk}
"""


def ccf_sql(max_lag: int = 3) -> str:
    """Mirrors timeseries.cross_correlation over the daily click (A)
    vs purchase (B) cents rollups: truncating-BIGINT means/devs, A's
    variance as the β normalizer, pairs where both days exist."""
    return f"""
WITH e AS (
  SELECT EPOCH_NS(ts) // 86400000000000 AS day, event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
ra AS (SELECT day, CAST(SUM(cents) AS BIGINT) AS x FROM e
       WHERE event_type = 'click' GROUP BY 1),
rb AS (SELECT day, CAST(SUM(cents) AS BIGINT) AS x FROM e
       WHERE event_type = 'purchase' GROUP BY 1),
ma AS (SELECT CAST(SUM(x) // COUNT(*) AS BIGINT) AS m FROM ra),
mb AS (SELECT CAST(SUM(x) // COUNT(*) AS BIGINT) AS m FROM rb),
da AS (SELECT day, x - (SELECT m FROM ma) AS d FROM ra),
db_ AS (SELECT day, x - (SELECT m FROM mb) AS d FROM rb),
v AS (SELECT CAST(SUM(d * d) AS BIGINT) AS var FROM da),
p AS (
  SELECT l.lag, CAST(SUM(a.d * b.d) AS BIGINT) AS cov,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM da a
  CROSS JOIN UNNEST(range(-{max_lag}, {max_lag + 1})) AS l(lag)
  JOIN db_ b ON b.day = a.day + l.lag
  GROUP BY 1
)
SELECT CAST(lag AS BIGINT) AS lag,
       CAST((1000 * cov) // (SELECT var FROM v) AS BIGINT) AS beta_milli,
       n_pairs
FROM p WHERE (SELECT var FROM v) > 0
"""


def attribution_sql(lookback_days: int = 7) -> str:
    """Mirrors relational.attribution + the events_attribution report:
    user-keyed conversion x touch join inside the lookback window,
    per-conversion (ts, id) rank, the three credit models with the
    linear remainder on the LAST touch."""
    return f"""
WITH conv AS (
  SELECT user_id AS u, event_id AS cid, ts AS cts,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
tch AS (
  SELECT user_id AS u, event_id AS tid, event_type AS tt, ts AS tts
  FROM events WHERE event_type IN ('view', 'click')
),
j AS (
  SELECT conv.cid, conv.cents, tch.tid, tch.tt, tch.tts
  FROM conv JOIN tch ON conv.u = tch.u
   AND tch.tts < conv.cts
   AND tch.tts >= conv.cts - INTERVAL {lookback_days} DAY
),
r AS (
  SELECT cid, cents, tt,
         ROW_NUMBER() OVER (PARTITION BY cid ORDER BY tts, tid) AS rk,
         COUNT(*) OVER (PARTITION BY cid) AS n
  FROM j
)
SELECT tt AS touch_type,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT cid) AS BIGINT) AS n_conversions,
       CAST(SUM(CASE WHEN rk = 1 THEN 1000 * cents ELSE 0 END) AS BIGINT)
         AS first_milli,
       CAST(SUM(CASE WHEN rk = n THEN 1000 * cents ELSE 0 END) AS BIGINT)
         AS last_milli,
       CAST(SUM(CASE WHEN rk = n
                THEN 1000 * cents - (n - 1) * ((1000 * cents) // n)
                ELSE (1000 * cents) // n END) AS BIGINT) AS linear_milli
FROM r GROUP BY 1
"""


def holt_sql(
    alpha_milli: int = 300, beta_milli: int = 100, horizon: int = 3
) -> str:
    """Mirrors timeseries.holt_smooth over the weekly orders-cents
    rollup: the milli-state truncating BIGINT recursion replayed as a
    RECURSIVE CTE (l_t inlined twice inside b_t, exactly as the
    engine's fold repeats it)."""
    a, b = alpha_milli, beta_milli
    return f"""
WITH RECURSIVE r AS (
  SELECT o_orderpriority AS pk,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) // 7
           AS wk,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
),
idx AS (
  SELECT pk, CAST(ROW_NUMBER() OVER (PARTITION BY pk ORDER BY wk) AS BIGINT)
           AS i, cents
  FROM r
),
nn AS (SELECT pk, CAST(MAX(i) AS BIGINT) AS n FROM idx GROUP BY 1),
hw AS (
  SELECT i1.pk, CAST(1 AS BIGINT) AS i,
         CAST(1000 * i1.cents AS BIGINT) AS l,
         CAST(COALESCE(1000 * (i2.cents - i1.cents), 0) AS BIGINT) AS b
  FROM idx i1 LEFT JOIN idx i2 ON i2.pk = i1.pk AND i2.i = 2
  WHERE i1.i = 1
  UNION ALL
  SELECT hw.pk, hw.i + 1,
         CAST(({a} * 1000 * x.cents + {1000 - a} * (hw.l + hw.b)) // 1000
              AS BIGINT),
         CAST(({b} * ((({a} * 1000 * x.cents + {1000 - a} * (hw.l + hw.b))
                       // 1000) - hw.l)
               + {1000 - b} * hw.b) // 1000 AS BIGINT)
  FROM hw JOIN idx x ON x.pk = hw.pk AND x.i = hw.i + 1
)
SELECT f.pk AS o_orderpriority, nn.n AS n_buckets,
       f.l AS level_milli, f.b AS trend_milli,
       CAST(hh.h AS BIGINT) AS h,
       CAST(f.l + hh.h * f.b AS BIGINT) AS forecast_milli
FROM hw f
JOIN nn ON f.pk = nn.pk AND f.i = nn.n
CROSS JOIN (SELECT unnest(range(1, {horizon + 1})) AS h) hh
"""


def _longquote_cte(rare: bool = False) -> str:
    """documents + planted long-quote carriers (doc_id %% 9 == 0 ->
    new id +400000, a fixed 100-token quote prefixed to the text) —
    mirrored in queries._docs_with_longquote.  ``rare=True`` plants
    the quote in exactly TWO docs (ids 0 and 9 -> +400000; mirrored in
    queries._docs_with_rare_longquote) so only the exact-run path can
    reach it."""
    where = "doc_id IN (0, 9)" if rare else "doc_id % 9 = 0"
    return f"""docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 400000,
         array_to_string(list_transform(range(100),
                         i -> 'q' || CAST(i AS VARCHAR)), ' ') || ' ' || text
  FROM documents WHERE {where}
)"""


def heavy_hitters_sql() -> str:
    """Mirrors documents_heavy_hitters: exact counts over the composed
    stream (positioned 3-grams + planted hot keys); the contract
    booleans are THEOREM-true under any partitioning, so the oracle
    states them as constants — counter internals are deliberately not
    value-checked (the sketch-accuracy discipline)."""
    return f"""
WITH
{_docs_cte(False)},
{NORM_CTE},
grams AS (
  SELECT unnest(list_transform(range(greatest(len(t) - 3, 0) + 1),
                i -> array_to_string(t[i + 1 : i + 3], ' '))) AS token
  FROM toks
),
hot AS (
  SELECT 'hot_' || CAST(doc_id % 8 AS VARCHAR) AS token
  FROM documents, UNNEST(range(5)) AS u(i)
  WHERE doc_id % 3 = 0
),
stream AS (SELECT token FROM grams UNION ALL SELECT token FROM hot),
top8 AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_cnt
  FROM stream GROUP BY token
  ORDER BY exact_cnt DESC, token LIMIT 8
)
SELECT token, exact_cnt,
       TRUE AS is_heavy, TRUE AS present,
       TRUE AS est_le_exact, TRUE AS gap_within_bound
FROM top8
"""


def ngram_jaccard_sql(threshold: float = 0.05) -> str:
    return f"""
WITH
docs AS (SELECT doc_id, text, lang, source FROM documents),
{NORM_CTE},
{SHINGLE_CTE},
blocked AS (
  SELECT d.lang, d.source, s.doc_id AS sid, s.sh_set, len(s.sh_set) AS n_sh
  FROM sh s JOIN docs d ON s.doc_id = d.doc_id
),
ex AS (
  SELECT lang, source, sid, unnest(sh_set) AS shingle FROM blocked
),
dfc AS (
  SELECT lang, source, shingle, COUNT(*) AS df_n
  FROM ex GROUP BY lang, source, shingle
),
exk AS (
  SELECT e.lang, e.source, e.sid, e.shingle
  FROM ex e JOIN dfc d
    ON e.lang = d.lang AND e.source = d.source AND e.shingle = d.shingle
  WHERE d.df_n <= {MAX_SHINGLE_DF}
),
inter AS (
  SELECT ea.sid AS id_a, eb.sid AS id_b, COUNT(*) AS n_inter
  FROM exk ea JOIN exk eb
    ON ea.lang = eb.lang AND ea.source = eb.source AND ea.shingle = eb.shingle
  WHERE ea.sid < eb.sid
  GROUP BY ea.sid, eb.sid
)
SELECT i.id_a, i.id_b,
       ROUND(CAST(i.n_inter AS DOUBLE)
             / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE), {ROUND}) AS jaccard
FROM inter i
JOIN blocked sa ON i.id_a = sa.sid
JOIN blocked sb ON i.id_b = sb.sid
WHERE CAST(i.n_inter AS DOUBLE)
      / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE) > {threshold}
"""


def containment_sql(min_micro: int = 600_000) -> str:
    """Mirrors pipeline_containment: dup-planted corpus, valve-capped
    inverted-index intersection, directional integer containment."""
    return f"""
WITH
{_docs_cte(True)},
{NORM_CTE},
{SHINGLE_CTE},
szs AS (
  SELECT doc_id AS sid, sh_set, CAST(len(sh_set) AS BIGINT) AS n_sh
  FROM sh WHERE len(sh_set) > 0
),
ex AS (SELECT sid, unnest(sh_set) AS shingle FROM szs),
dfc AS (SELECT shingle, COUNT(*) AS df_n FROM ex GROUP BY shingle),
exk AS (
  SELECT e.sid, e.shingle FROM ex e JOIN dfc USING (shingle)
  WHERE df_n <= {MAX_SHINGLE_DF}
),
inter AS (
  SELECT ea.sid AS id_a, eb.sid AS id_b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM exk ea JOIN exk eb USING (shingle)
  WHERE ea.sid < eb.sid GROUP BY 1, 2
),
dirs AS (
  SELECT id_a AS src_id, id_b AS dst_id, n_inter FROM inter
  UNION ALL
  SELECT id_b AS src_id, id_a AS dst_id, n_inter FROM inter
)
SELECT b.src_id, b.dst_id, b.n_inter,
       s.n_sh AS n_src_shingles,
       CAST((1000000 * b.n_inter) // s.n_sh AS BIGINT) AS containment_micro
FROM dirs b JOIN szs s ON b.src_id = s.sid
WHERE (1000000 * b.n_inter) // s.n_sh >= {min_micro}
"""


def text_stats_sql() -> str:
    return f"""
WITH
{_docs_cte(False)},
{NORM_CTE}
SELECT d.doc_id,
       len(tk.t) AS n_tokens,
       len(regexp_extract_all(n.ntext, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
       length(d.text) AS n_chars,
       ROUND(CAST(list_sum(list_transform(tk.t, x -> length(x))) AS DOUBLE)
             / CAST(len(tk.t) AS DOUBLE), {ROUND}) AS mean_token_len,
       ROUND(CAST(len(list_filter(tk.t, x -> list_contains({_STOPLIST}, x))) AS DOUBLE)
             / CAST(len(tk.t) AS DOUBLE), {ROUND}) AS stopword_ratio,
       ROUND(CAST(length(regexp_replace(d.text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
             / CAST(length(d.text) AS DOUBLE), {ROUND}) AS punct_ratio,
       CASE WHEN CAST(len(list_filter(tk.t, x -> list_contains({_STOPLIST}, x))) AS DOUBLE)
                 / CAST(len(tk.t) AS DOUBLE) >= 0.02
            THEN 'en' ELSE 'unknown' END AS lang_pred,
       ROUND(least(CAST(len(tk.t) AS DOUBLE) / 64.0, 1.0) * 0.5
             + least(CAST(len(list_filter(tk.t, x -> list_contains({_STOPLIST}, x))) AS DOUBLE)
                     / CAST(len(tk.t) AS DOUBLE) * 10.0, 1.0) * 0.5, {ROUND}) AS quality
FROM docs d
JOIN toks tk ON d.doc_id = tk.doc_id
JOIN norm n ON d.doc_id = n.doc_id
"""


def multimodal_features_sql() -> str:
    """Oracle for multimodal.extract_features over attach_payload(docs):
    the demo payload is the utf-8 bytes of ``text`` (pure-ASCII corpus,
    so codepoints == bytes and the byte stats are SQL-expressible);
    the fake decoder is a row-major width-16 reshape."""
    return """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       CAST(list_sum(list_transform(range(length(text)),
            i -> unicode(text[i + 1 : i + 1]))) AS BIGINT) AS byte_sum,
       ROUND(CAST(list_sum(list_transform(range(length(text)),
            i -> unicode(text[i + 1 : i + 1]))) AS DOUBLE)
            / CAST(octet_length(encode(text)) AS DOUBLE), 6) AS mean_byte,
       CAST(greatest(octet_length(encode(text)) // 16, 1) AS INTEGER) AS height,
       16 AS width,
       md5(text) AS payload_md5
FROM documents
"""


# ---------------------------------------------------------------------------
# Similarity search (xesmf_spark.similarity over the embeddings table)
# ---------------------------------------------------------------------------

#: (id, v, nrm) per vector — dot products are sequential left-to-right
#: folds over DOUBLE-cast elements, bit-matching the Spark aggregate()
_VEC_CTE = """
v AS (
  SELECT vec_id AS id, embedding AS v,
         sqrt(list_sum(list_transform(range(len(embedding)),
              i -> embedding[i + 1]::DOUBLE * embedding[i + 1]::DOUBLE))) AS nrm
  FROM embeddings
)"""

_DOT = (
    "list_sum(list_transform(range(len({a}.v)), "
    "i -> {a}.v[i + 1]::DOUBLE * {b}.v[i + 1]::DOUBLE))"
)


def ann_cosine_topk_sql(k: int = 3) -> str:
    dot = _DOT.format(a="q", b="p")
    return f"""
WITH
{_VEC_CTE},
pairs AS (
  SELECT q.id AS query_id, p.id AS neighbor_id,
         ROUND({dot} / (q.nrm * p.nrm), 6) AS cosine
  FROM v q CROSS JOIN v p
  WHERE q.id != p.id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM pairs
) WHERE rank <= {k}
"""


_VEC_DUPS_CTE = """
embx AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000,
         list_transform(embedding, x -> CAST(x * 1.02 AS FLOAT))
  FROM embeddings WHERE vec_id % 4 = 0
),
v AS (
  SELECT vec_id AS id, embedding AS v,
         sqrt(list_sum(list_transform(range(len(embedding)),
              i -> embedding[i + 1]::DOUBLE * embedding[i + 1]::DOUBLE))) AS nrm
  FROM embx
)"""


def embedding_dedup_sql(
    threshold: float = 0.98, n_centroids: int = 8, n_probe: int = 2
) -> str:
    cdot = _DOT.format(a="x", b="c")
    qdot = _DOT.format(a="q", b="p")
    return f"""
WITH
{_VEC_DUPS_CTE},
cents AS (SELECT id AS cell, v, nrm FROM v WHERE id < {n_centroids}),
assign AS (
  SELECT x.id, x.v, x.nrm, c.cell,
         ROW_NUMBER() OVER (PARTITION BY x.id
           ORDER BY ROUND({cdot} / (x.nrm * c.nrm), 6) DESC, c.cell ASC) AS crank
  FROM v x CROSS JOIN cents c
),
aa AS (SELECT cell, id, v, nrm FROM assign WHERE crank <= {n_probe}),
bb AS (SELECT cell, id, v, nrm FROM assign WHERE crank = 1)
SELECT DISTINCT q.id AS id_a, p.id AS id_b,
       ROUND({qdot} / (q.nrm * p.nrm), 6) AS cosine
FROM aa q JOIN bb p ON q.cell = p.cell
WHERE q.id < p.id
  AND ROUND({qdot} / (q.nrm * p.nrm), 6) >= {threshold}
"""


def _pq_ctes(m: int, ksub: int, dsub: int) -> str:
    """CTE chain ``emb/sub/cb/d/enc`` shared by the PQ oracles:
    subvector split, seed codebooks (vec_id < ksub), micro-floored
    integer distances ``d`` (doubling as every query's ADC lookup
    table), and the per-(vector, subspace) argmin encoding ``enc``
    (tie to the lower code)."""
    return f"""emb AS (SELECT vec_id, embedding FROM embeddings),
sub AS (
  SELECT vec_id, CAST(s AS INT) AS s,
         list_transform(embedding[CAST(s * {dsub} + 1 AS INT) : CAST(s * {dsub} + {dsub} AS INT)],
                        x -> CAST(x AS DOUBLE)) AS xs
  FROM emb CROSS JOIN range({m}) AS t(s)
),
cb AS (SELECT s, vec_id AS code, xs AS cs FROM sub WHERE vec_id < {ksub}),
d AS (
  SELECT sub.vec_id, sub.s, cb.code,
         CAST(FLOOR({1_000_000} * list_sum(list_transform(range({dsub}),
              i -> (sub.xs[CAST(i + 1 AS INT)] - cb.cs[CAST(i + 1 AS INT)])
                 * (sub.xs[CAST(i + 1 AS INT)] - cb.cs[CAST(i + 1 AS INT)]))))
              AS BIGINT) AS d2u
  FROM sub JOIN cb ON sub.s = cb.s
),
enc AS (
  SELECT vec_id, s, code FROM (
    SELECT vec_id, s, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, s
                              ORDER BY d2u ASC, code ASC) AS rn
    FROM d
  ) WHERE rn = 1
)"""


def ann_pq_topk_sql(
    k: int = 3, m: int = 16, ksub: int = 256, dsub: int = 4
) -> str:
    """Mirrors similarity.pq_topk (seed codebooks): subvector split,
    encode-time argmin over micro-floored integer distances (tie to the
    lower code), ADC = exact BIGINT sum of m lookup-table entries, and
    the (distance, neighbor) row-number top-k. Every compared or summed
    value is an exact integer; the pre-floor doubles are sequential
    left-to-right folds over identical operands on both engines."""
    return f"""
WITH {_pq_ctes(m, ksub, dsub)},
adc AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         CAST(SUM(lut.d2u) AS BIGINT) AS approx_d2_micro
  FROM (SELECT vec_id FROM emb) q
  JOIN enc e ON e.vec_id <> q.vec_id
  JOIN d lut ON lut.vec_id = q.vec_id AND lut.s = e.s AND lut.code = e.code
  GROUP BY 1, 2
)
SELECT query_id, rank, neighbor_id, approx_d2_micro FROM (
  SELECT query_id, neighbor_id, approx_d2_micro,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY approx_d2_micro ASC, neighbor_id ASC) AS rank
  FROM adc
) WHERE rank <= {k}
"""


def ann_ivfpq_topk_sql(
    k: int = 3,
    n_centroids: int = 8,
    n_probe: int = 2,
    m: int = 16,
    ksub: int = 256,
    dsub: int = 4,
) -> str:
    """Mirrors similarity.ivfpq_topk — the composed IVF+PQ index: seed
    IVF cells bound WHICH candidates a query touches (cosine
    assignment, rounded-6 + cell tie-break, n_probe cells per query);
    seed PQ codes bound what each candidate COSTS (exact-integer ADC).
    Each pool vector lives in exactly one cell, so (query, candidate)
    pairs are unique and the ADC GROUP BY sums exactly m BIGINTs."""
    cdot = _DOT.format(a="x", b="c")
    return f"""
WITH
{_VEC_CTE},
cents AS (SELECT id AS cell, v, nrm FROM v WHERE id < {n_centroids}),
assign AS (
  SELECT x.id, c.cell,
         ROW_NUMBER() OVER (PARTITION BY x.id
           ORDER BY ROUND({cdot} / (x.nrm * c.nrm), 6) DESC, c.cell ASC) AS crank
  FROM v x CROSS JOIN cents c
),
pool0 AS (SELECT cell, id FROM assign WHERE crank = 1),
probes AS (SELECT cell, id FROM assign WHERE crank <= {n_probe}),
{_pq_ctes(m, ksub, dsub)},
poolc AS (
  SELECT p.cell, e.vec_id, e.s, e.code
  FROM pool0 p JOIN enc e ON e.vec_id = p.id
),
adc AS (
  SELECT q.id AS query_id, pc.vec_id AS neighbor_id,
         CAST(SUM(lut.d2u) AS BIGINT) AS approx_d2_micro
  FROM probes q
  JOIN poolc pc ON pc.cell = q.cell AND pc.vec_id <> q.id
  JOIN d lut ON lut.vec_id = q.id AND lut.s = pc.s AND lut.code = pc.code
  GROUP BY 1, 2
)
SELECT query_id, rank, neighbor_id, approx_d2_micro FROM (
  SELECT query_id, neighbor_id, approx_d2_micro,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY approx_d2_micro ASC, neighbor_id ASC) AS rank
  FROM adc
) WHERE rank <= {k}
"""


def ann_ivfpq_refine_topk_sql(
    k: int = 3,
    n_centroids: int = 8,
    n_probe: int = 2,
    m: int = 16,
    ksub: int = 256,
    dsub: int = 4,
    refine_k: int = 16,
    dim: int = 64,
) -> str:
    """Mirrors similarity.ivfpq_topk(refine_k=...) — the production
    shortlist-then-rerank shape (FAISS IndexRefineFlat): each probed
    cell's ADC top-``refine_k`` shortlist (per-(query, cell) row_number
    over the exact-integer ADC sums, neighbor tie-break) is re-scored
    with the TRUE euclidean fold — identical to the euclid_topk oracle:
    sequential (x-y)^2 list fold, ROUND 6, (d2, neighbor) tie-break."""
    cdot = _DOT.format(a="x", b="c")
    return f"""
WITH
{_VEC_CTE},
cents AS (SELECT id AS cell, v, nrm FROM v WHERE id < {n_centroids}),
assign AS (
  SELECT x.id, c.cell,
         ROW_NUMBER() OVER (PARTITION BY x.id
           ORDER BY ROUND({cdot} / (x.nrm * c.nrm), 6) DESC, c.cell ASC) AS crank
  FROM v x CROSS JOIN cents c
),
pool0 AS (SELECT cell, id FROM assign WHERE crank = 1),
probes AS (SELECT cell, id FROM assign WHERE crank <= {n_probe}),
{_pq_ctes(m, ksub, dsub)},
poolc AS (
  SELECT p.cell, e.vec_id, e.s, e.code
  FROM pool0 p JOIN enc e ON e.vec_id = p.id
),
adc AS (
  SELECT q.id AS query_id, q.cell, pc.vec_id AS neighbor_id,
         CAST(SUM(lut.d2u) AS BIGINT) AS approx_d2_micro
  FROM probes q
  JOIN poolc pc ON pc.cell = q.cell AND pc.vec_id <> q.id
  JOIN d lut ON lut.vec_id = q.id AND lut.s = pc.s AND lut.code = pc.code
  GROUP BY 1, 2, 3
),
shortlist AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id, cell
                              ORDER BY approx_d2_micro ASC, neighbor_id ASC) AS cr
    FROM adc
  ) WHERE cr <= {refine_k}
),
vv AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
  FROM embeddings
),
rer AS (
  SELECT s.query_id, s.neighbor_id,
         ROUND(list_sum(list_transform(range({dim}),
               i -> (a.vv[CAST(i + 1 AS INT)] - b.vv[CAST(i + 1 AS INT)])
                  * (a.vv[CAST(i + 1 AS INT)] - b.vv[CAST(i + 1 AS INT)]))), 6) AS d2
  FROM shortlist s
  JOIN vv a ON a.vec_id = s.query_id
  JOIN vv b ON b.vec_id = s.neighbor_id
)
SELECT query_id, rank, neighbor_id, d2 FROM (
  SELECT query_id, neighbor_id, d2,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY d2 ASC, neighbor_id ASC) AS rank
  FROM rer
) WHERE rank <= {k}
"""


def ann_euclid_topk_sql(k: int = 3, dim: int = 64) -> str:
    """Mirrors similarity.euclid_topk: sequential (x-y)^2 list fold,
    rounded-6 ordering, neighbor-id tie-break."""
    return f"""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         ROUND(list_sum(list_transform(range({dim}),
               i -> (a.vv[CAST(i + 1 AS INT)] - b.vv[CAST(i + 1 AS INT)])
                  * (a.vv[CAST(i + 1 AS INT)] - b.vv[CAST(i + 1 AS INT)]))), 6) AS d2
  FROM v a JOIN v b ON a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, d2, rank FROM (
  SELECT query_id, neighbor_id, d2,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY d2 ASC, neighbor_id ASC) AS rank
  FROM pairs
) WHERE rank <= {k}
"""


def ann_ivf_topk_sql(k: int = 3, n_centroids: int = 8, n_probe: int = 2) -> str:
    cdot = _DOT.format(a="x", b="c")
    qdot = _DOT.format(a="q", b="p")
    return f"""
WITH
{_VEC_CTE},
cents AS (SELECT id AS cell, v, nrm FROM v WHERE id < {n_centroids}),
assign AS (
  SELECT x.id, x.v, x.nrm, c.cell,
         ROW_NUMBER() OVER (PARTITION BY x.id
           ORDER BY ROUND({cdot} / (x.nrm * c.nrm), 6) DESC, c.cell ASC) AS crank
  FROM v x CROSS JOIN cents c
),
pool AS (SELECT cell, id, v, nrm FROM assign WHERE crank = 1),
probes AS (SELECT cell, id, v, nrm FROM assign WHERE crank <= {n_probe}),
cand AS (
  SELECT DISTINCT q.id AS query_id, p.id AS neighbor_id,
         ROUND({qdot} / (q.nrm * p.nrm), 6) AS cosine
  FROM probes q JOIN pool p ON q.cell = p.cell
  WHERE q.id != p.id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM cand
) WHERE rank <= {k}
"""


def fingerprint_sql(k: int = 4) -> str:
    return f"""
WITH
{_docs_cte(False)},
{NORM_CTE},
{SHINGLE_CTE},
hashes AS (
  SELECT doc_id,
         list_sort(list_transform(sh_set,
           s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % {P})) AS hs
  FROM sh
),
rh AS (
  SELECT doc_id,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(ntext, ''), ch -> CAST(unicode(ch) AS BIGINT))),
           (a, b) -> (a * 131 + b) % {P}) AS content_hash
  FROM norm
)
SELECT h.doc_id,
       md5(array_to_string(h.hs[1 : {k}], '_')) AS fingerprint,
       r.content_hash
FROM hashes h JOIN rh r ON h.doc_id = r.doc_id
"""


def clean_corpus_sql(threshold: float = 0.5, min_quality: float = 0.5,
                     min_tokens: int = 5) -> str:
    """End-to-end corpus cleaning, composed from the per-operator CTEs:
    exact dedup -> near-dup connected components over the exact
    survivors -> quality/length filter -> per-survivor stats. The SQL is
    the same chain the Spark query runs (pipeline.exact_dedup ->
    minhash_dedup_pairs -> dedup_groups -> text_stats), so value parity
    checks the COMPOSITION, not just each stage."""
    return f"""
WITH RECURSIVE
{_docs_cte(True).replace("docs AS (", "base AS (", 1)},
bnorm AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS ntext
  FROM base
),
ek AS (SELECT MIN(doc_id) AS keep FROM bnorm GROUP BY md5(ntext)),
docs AS (SELECT b.doc_id, b.text FROM base b JOIN ek ON b.doc_id = ek.keep),
{_pair_chain(threshold)},
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT src AS node, src AS lbl FROM edges
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node
),
comp AS (SELECT node, MIN(lbl) AS keep FROM reach GROUP BY node),
survivors AS (
  SELECT d.doc_id, d.text FROM docs d
  LEFT JOIN comp c ON d.doc_id = c.node
  WHERE COALESCE(c.keep, d.doc_id) = d.doc_id
)
SELECT s.doc_id,
       len(tk.t) AS n_tokens,
       ROUND(least(CAST(len(tk.t) AS DOUBLE) / 64.0, 1.0) * 0.5
             + least(CAST(len(list_filter(tk.t, x -> list_contains({_STOPLIST}, x))) AS DOUBLE)
                     / CAST(len(tk.t) AS DOUBLE) * 10.0, 1.0) * 0.5, {ROUND}) AS quality
FROM survivors s
JOIN toks tk ON s.doc_id = tk.doc_id
WHERE len(tk.t) >= {min_tokens}
  AND least(CAST(len(tk.t) AS DOUBLE) / 64.0, 1.0) * 0.5
      + least(CAST(len(list_filter(tk.t, x -> list_contains({_STOPLIST}, x))) AS DOUBLE)
              / CAST(len(tk.t) AS DOUBLE) * 10.0, 1.0) * 0.5 >= {min_quality}
"""


def langid_ngram_sql() -> str:
    """Mirror of pipeline.langid_ngram: same padded-trigram list, same
    profile-hit fractions, same GREATEST + CASE tie-break order."""
    from xesmf_spark.pipeline import LANG_TRIGRAMS, LANGID_MIN_SCORE

    score_cols, case_arms = [], []
    for lang, prof in LANG_TRIGRAMS.items():
        plist = "[" + ", ".join(f"'{g}'" for g in prof) + "]"
        score_cols.append(
            f"CAST(len(list_filter(tri, x -> list_contains({plist}, x))) AS DOUBLE)"
            f" / CAST(len(tri) AS DOUBLE) AS score_{lang}"
        )
        case_arms.append(f"WHEN score_{lang} = best THEN '{lang}'")
    greatest = "GREATEST(" + ", ".join(f"score_{l}" for l in LANG_TRIGRAMS) + ")"
    rounded = ",\n       ".join(
        f"ROUND(score_{l}, {ROUND}) AS score_{l}" for l in LANG_TRIGRAMS
    )
    return f"""
WITH
{_docs_cte(False)},
padded AS (
  SELECT doc_id,
         ' ' || lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) || ' ' AS p
  FROM docs
),
trig AS (
  SELECT doc_id,
         list_transform(range(greatest(length(p) - 2, 1)),
                        i -> substr(p, i + 1, 3)) AS tri
  FROM padded
),
scored AS (
  SELECT doc_id,
         {", ".join(score_cols)}
  FROM trig
),
best AS (
  SELECT *, {greatest} AS best FROM scored
)
SELECT doc_id,
       {rounded},
       CASE WHEN best < {LANGID_MIN_SCORE} THEN 'unknown'
            {" ".join(case_arms)}
       END AS lang_pred
FROM best
"""


def lsh_dedup_sql(threshold: float = 0.95, dim: int = 64) -> str:
    """Mirror of similarity.lsh_dedup_pairs: the SAME md5-derived ±1
    hyperplanes (shared Python generator), same band-bucket packing,
    same candidate equi-join + exact-cosine verify over the planted-dup
    embedding fixture."""
    from xesmf_spark.similarity import LSH_BANDS, LSH_BITS, lsh_hyperplanes

    planes = lsh_hyperplanes(dim)
    per_band = LSH_BITS // LSH_BANDS

    def plane_lit(p):
        return "[" + ", ".join(str(x) for x in p) + "]"

    bit_exprs = [
        f"CASE WHEN list_sum(list_transform(range({dim}), "
        f"j -> v[j + 1]::DOUBLE * ({plane_lit(p)})[j + 1])) >= 0.0 "
        f"THEN 1 ELSE 0 END"
        for p in planes
    ]
    band_selects = []
    for b in range(LSH_BANDS):
        bucket = " + ".join(
            f"({bit_exprs[b * per_band + j]}) * {1 << j}" for j in range(per_band)
        )
        band_selects.append(f"SELECT id, v, nrm, {b} AS band, {bucket} AS bkt FROM v")
    dot = _DOT.format(a="a", b="b")
    return f"""
WITH
{_VEC_DUPS_CTE},
tagged AS (
  {" UNION ALL ".join(band_selects)}
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       ROUND({dot} / (a.nrm * b.nrm), 6) AS cosine
FROM tagged a JOIN tagged b ON a.band = b.band AND a.bkt = b.bkt
WHERE a.id < b.id
  AND ROUND({dot} / (a.nrm * b.nrm), 6) >= {threshold}
"""


def prefix_filter_sql(threshold_micro: int = 600_000) -> str:
    """Exact integer replay of pipeline.prefix_filter_pairs on the
    planted-dup corpus: global (df, tok) order, prefix slice via the
    same ceil identity, length filter, exact integer Jaccard."""
    return f"""
WITH
{_docs_cte(True)},
{NORM_CTE},
{SHINGLE_CTE},
ex AS (SELECT doc_id, unnest(sh_set) AS tok FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM ex GROUP BY doc_id),
dfc AS (SELECT tok, COUNT(*) AS dfn FROM ex GROUP BY tok),
ordered AS (
  SELECT e.doc_id, e.tok, s.n_sh,
         ROW_NUMBER() OVER (
           PARTITION BY e.doc_id ORDER BY d.dfn ASC, e.tok ASC) AS rn
  FROM ex e JOIN dfc d USING (tok) JOIN sizes s USING (doc_id)
),
pfx AS (
  SELECT * FROM ordered
  WHERE rn <= n_sh - ({threshold_micro} * n_sh + 999999) // 1000000 + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM pfx a JOIN pfx b ON a.tok = b.tok AND a.doc_id < b.doc_id
  WHERE LEAST(a.n_sh, b.n_sh) * 1000000 >= {threshold_micro} * GREATEST(a.n_sh, b.n_sh)
),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN ex ea ON ea.doc_id = c.id_a
  JOIN ex eb ON eb.doc_id = c.id_b AND eb.tok = ea.tok
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
       CAST((1000000 * i.n_inter) // (sa.n_sh + sb.n_sh - i.n_inter) AS BIGINT)
         AS jaccard_micro
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE (1000000 * i.n_inter) // (sa.n_sh + sb.n_sh - i.n_inter) >= {threshold_micro}
"""


def keep_best_sql(threshold: float = 0.5) -> str:
    """Mirrors pipeline.dedup_keep_best over the planted corpus: the
    dedup_groups recursive-CTE components + the integer quality score,
    one window ranking (quality DESC, id ASC) per component."""
    return f"""
WITH RECURSIVE
{_pair_ctes(threshold)},
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT src AS node, src AS lbl FROM edges
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node
),
comp AS (SELECT node, MIN(lbl) AS keep FROM reach GROUP BY node),
labeled AS (
  SELECT d.doc_id, COALESCE(c.keep, d.doc_id) AS group_id
  FROM docs d LEFT JOIN comp c ON d.doc_id = c.node
),
q AS (
  SELECT doc_id,
         CAST((1000000 * len(list_distinct(
                 string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '))))
              // len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '))
           AS BIGINT) AS qm_micro
  FROM docs
),
ranked AS (
  SELECT l.doc_id, l.group_id, q.qm_micro,
         ROW_NUMBER() OVER (PARTITION BY l.group_id
                            ORDER BY q.qm_micro DESC, l.doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY l.group_id) AS gsz
  FROM labeled l JOIN q USING (doc_id)
)
SELECT doc_id, group_id, CAST(gsz AS BIGINT) AS group_size, qm_micro
FROM ranked WHERE rn = 1
"""


def ann_ivf_filtered_sql(
    k: int = 3, n_centroids: int = 8, n_probe: int = 2, modulus: int = 5
) -> str:
    """Mirrors similarity.ivf_topk_filtered: the ann_ivf_topk_sql chain
    with the POOL restricted to the metadata predicate
    (vec_id %% modulus == 0) BEFORE candidate generation — queries stay
    unfiltered."""
    cdot = _DOT.format(a="x", b="c")
    qdot = _DOT.format(a="q", b="p")
    return f"""
WITH
{_VEC_CTE},
cents AS (SELECT id AS cell, v, nrm FROM v WHERE id < {n_centroids}),
assign AS (
  SELECT x.id, x.v, x.nrm, c.cell,
         ROW_NUMBER() OVER (PARTITION BY x.id
           ORDER BY ROUND({cdot} / (x.nrm * c.nrm), 6) DESC, c.cell ASC) AS crank
  FROM v x CROSS JOIN cents c
),
pool AS (SELECT cell, id, v, nrm FROM assign WHERE crank = 1 AND id % {modulus} = 0),
probes AS (SELECT cell, id, v, nrm FROM assign WHERE crank <= {n_probe}),
cand AS (
  SELECT DISTINCT q.id AS query_id, p.id AS neighbor_id,
         ROUND({qdot} / (q.nrm * p.nrm), 6) AS cosine
  FROM probes q JOIN pool p ON q.cell = p.cell
  WHERE q.id != p.id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM cand
) WHERE rank <= {k}
"""


# ---------------------------------------------------------------- BPE

#: word-frequency model + positional symbol table (step0) — the
#: relational replay of xesmf_spark.bpe training state.  BPE's merge
#: loop is per-word, so the oracle (like the engine) works on DISTINCT
#: words weighted by corpus frequency.
_BPE_WORDS_CTE = r"""
bwords AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split(
             lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS word
    FROM documents
  ) WHERE length(word) > 0
  GROUP BY word
),
step0 AS MATERIALIZED (
  SELECT word, freq, u.pos AS pos, u.sym AS sym FROM (
    SELECT word, freq,
           unnest(list_transform(string_split(word, ''),
                                 (c, i) -> {'sym': c, 'pos': i})) AS u
    FROM bwords
  )
)"""


def _bpe_iter_ctes(k: int) -> str:
    """CTEs for one BPE merge iteration ``k`` (1-based), reading
    ``step{k-1}`` and producing ``best{k}`` + ``step{k}``.

    The greedy left-to-right non-overlap rule is run-parity selection:
    adjacent-position matches overlap (share the middle symbol), so
    within each maximal RUN of consecutive match positions the sweep
    fuses the 1st, 3rd, 5th ... occurrence — `pos - row_number()` is
    the classic run key, a second ROW_NUMBER gives position-in-run,
    odd ranks win.  This is a DIFFERENT algorithm from the engine's
    ``aggregate`` fold (positional joins vs a sequential fold), which
    is the point: two independent formulations must agree."""
    p = k - 1
    return f"""
pairs{k} AS MATERIALIZED (
  SELECT a.sym AS l, b.sym AS r, CAST(SUM(a.freq) AS BIGINT) AS cnt
  FROM step{p} a JOIN step{p} b ON a.word = b.word AND b.pos = a.pos + 1
  GROUP BY 1, 2
),
best{k} AS MATERIALIZED (
  SELECT l, r, cnt FROM pairs{k} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
),
match{k} AS MATERIALIZED (
  SELECT a.word, a.pos
  FROM step{p} a
  JOIN step{p} b ON a.word = b.word AND b.pos = a.pos + 1
  JOIN best{k} bb ON a.sym = bb.l AND b.sym = bb.r
),
sel{k} AS MATERIALIZED (
  SELECT word, pos FROM (
    SELECT word, pos,
           ROW_NUMBER() OVER (PARTITION BY word, pos - rn ORDER BY pos) AS kir
    FROM (
      SELECT word, pos,
             ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS rn
      FROM match{k}
    )
  ) WHERE kir % 2 = 1
),
step{k} AS MATERIALIZED (
  SELECT word, freq,
         ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS pos, sym
  FROM (
    SELECT s.word, s.freq, s.pos,
           CASE WHEN st.pos IS NOT NULL THEN s.sym || nx.sym ELSE s.sym END AS sym
    FROM step{p} s
    LEFT JOIN sel{k} st ON s.word = st.word AND s.pos = st.pos
    LEFT JOIN sel{k} dr ON s.word = dr.word AND s.pos = dr.pos + 1
    LEFT JOIN step{p} nx ON s.word = nx.word AND nx.pos = s.pos + 1
    WHERE dr.pos IS NULL
  )
)"""


_UNIGRAM_INF = 10**15
_UNIGRAM_RARE = 50 * 1_000_000


def _unigram_seed_ctes(P: int, n_seed: int) -> str:
    """Seed CTEs: substring counts (per-position, freq-weighted) ->
    top-n_seed multi-char + ALL singles -> micro-nat scored vocab0."""
    sub_lists = " || ".join(
        f"list_transform(range(0, length(word) - {l} + 1),"
        f" i -> substr(word, CAST(i AS INT) + 1, {l}))"
        for l in range(1, P + 1)
    )
    return f"""subs AS MATERIALIZED (
  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
    SELECT freq, unnest({sub_lists}) AS piece FROM bwords
  ) GROUP BY piece
),
seed0 AS MATERIALIZED (
  SELECT piece, cnt FROM (
    SELECT piece, cnt FROM subs WHERE length(piece) >= 2
    ORDER BY cnt DESC, piece ASC LIMIT {n_seed}
  )
  UNION ALL
  SELECT piece, cnt FROM subs WHERE length(piece) = 1
),
vocab0 AS MATERIALIZED (
  SELECT piece, cnt,
         CASE WHEN cnt > 0 THEN CAST(FLOOR(1000000 * ln(
                CAST((SELECT SUM(cnt) FROM seed0) AS DOUBLE)
                / CAST(cnt AS DOUBLE))) AS BIGINT)
              ELSE {_UNIGRAM_RARE} END AS score
  FROM seed0
)"""


def _unigram_em_ctes(tag: str, vocab: str, P: int) -> str:
    """One hard-EM round reading score table ``{vocab}``: recursive
    forward Viterbi DP (sliding ``P``-wide cost window carried on the
    frontier row — a recursive step only sees the previous step's
    rows), recursive backtrace taking the LONGEST piece achieving the
    optimum (structural tie-break, no aggregation in the recursive
    part — a CASE ladder), then freq-weighted piece counts.  Produces
    ``cnt{tag}`` and ``base{tag}`` (multi cnt>0 + all singles)."""
    carry = ", ".join(f"c{j}" for j in range(P))
    base_nulls = ", ".join(
        ["CAST(0 AS BIGINT)"] + ["CAST(NULL AS BIGINT)"] * (P - 1)
    )
    cands = ",\n           ".join(
        f"COALESCE(d.c{l - 1} + v{l}.score, {_UNIGRAM_INF})" for l in range(1, P + 1)
    )
    shift = ", ".join(f"d.c{j}" for j in range(P - 1))
    fwd_joins = "\n  ".join(
        f"LEFT JOIN {vocab} v{l} ON d.i >= {l - 1}"
        f" AND v{l}.piece = substr(d.word, d.i - {l - 2}, {l})"
        for l in range(1, P + 1)
    )
    bt_joins = "\n    ".join(
        f"LEFT JOIN dpt{tag} d{l} ON d{l}.word = b.word AND d{l}.i = b.i - {l}\n"
        f"    LEFT JOIN {vocab} v{l} ON v{l}.piece ="
        f" substr(b.word, b.i - {l - 1}, {l})"
        for l in range(2, P + 1)
    )
    oks = ",\n           ".join(
        f"COALESCE(d{l}.cost + v{l}.score = d0.cost, FALSE) AS ok{l}"
        for l in range(P, 1, -1)
    )
    step_case = " ".join(
        f"WHEN ok{l} THEN {l}" for l in range(P, 1, -1)
    )
    piece_case = " ".join(
        f"WHEN ok{l} THEN substr(b.word, b.i - {l - 1}, {l})"
        for l in range(P, 1, -1)
    )
    return f"""dp{tag}(word, i, {carry}) AS (
  SELECT word, 0, {base_nulls} FROM bwords
  UNION ALL
  SELECT d.word, d.i + 1,
         least({cands}),
         {shift}
  FROM dp{tag} d
  {fwd_joins}
  WHERE d.i < length(d.word)
),
dpt{tag} AS MATERIALIZED (SELECT word, i, c0 AS cost FROM dp{tag}),
bt{tag}(word, i, piece) AS (
  SELECT word, length(word), CAST(NULL AS VARCHAR) FROM bwords
  UNION ALL
  SELECT b.word,
         b.i - CASE {step_case} ELSE 1 END,
         CASE {piece_case} ELSE substr(b.word, b.i, 1) END
  FROM (
    SELECT b.word, b.i,
           {oks}
    FROM bt{tag} b
    JOIN dpt{tag} d0 ON d0.word = b.word AND d0.i = b.i
    {bt_joins}
    WHERE b.i > 0
  ) b
),
cnt{tag} AS MATERIALIZED (
  SELECT b.piece, CAST(SUM(w.freq) AS BIGINT) AS cnt
  FROM bt{tag} b JOIN bwords w USING (word)
  WHERE b.piece IS NOT NULL GROUP BY b.piece
),
base{tag} AS MATERIALIZED (
  SELECT piece, cnt FROM cnt{tag} WHERE length(piece) >= 2
  UNION ALL
  SELECT s.piece, COALESCE(c.cnt, CAST(0 AS BIGINT))
  FROM (SELECT piece FROM subs WHERE length(piece) = 1) s
  LEFT JOIN cnt{tag} c USING (piece)
)"""


def _unigram_score_cte(tag: str, base: str) -> str:
    return f"""vocab{tag} AS MATERIALIZED (
  SELECT piece, cnt,
         CASE WHEN cnt > 0 THEN CAST(FLOOR(1000000 * ln(
                CAST((SELECT SUM(cnt) FROM {base}) AS DOUBLE)
                / CAST(cnt AS DOUBLE))) AS BIGINT)
              ELSE {_UNIGRAM_RARE} END AS score
  FROM {base}
)"""


def _unigram_train_ctes(
    n_iters: int, P: int, n_seed: int, prune_to: int
) -> str:
    """The full training-loop CTE chain ending in ``baseF``/``vocabF``
    (the final E-step's counts and scores)."""
    parts = [
        _BPE_WORDS_CTE.split(",\nstep0")[0],  # bwords only
        _unigram_seed_ctes(P, n_seed),
    ]
    prev = "vocab0"
    for k in range(1, n_iters + 1):
        parts.append(_unigram_em_ctes(str(k), prev, P))
        parts.append(_unigram_score_cte(str(k), f"base{k}"))
        prev = f"vocab{k}"
    parts.append(
        f"""keepM AS MATERIALIZED (
  SELECT piece FROM base{n_iters} WHERE length(piece) >= 2
  ORDER BY cnt DESC, piece ASC LIMIT {prune_to}
),
baseP AS MATERIALIZED (
  SELECT b.piece, b.cnt FROM base{n_iters} b
  WHERE length(b.piece) = 1 OR b.piece IN (SELECT piece FROM keepM)
)"""
    )
    parts.append(_unigram_score_cte("P", "baseP"))
    parts.append(_unigram_em_ctes("F", "vocabP", P))
    parts.append(_unigram_score_cte("F", "baseF"))
    return ",\n".join(parts)


def unigram_train_sql(
    n_iters: int = 2, P: int = 4, n_seed: int = 256, prune_to: int = 96
) -> str:
    """Full relational replay of ``unigram.unigram_train`` — recursive
    -CTE Viterbi forward DP + longest-tie backtrace per hard-EM round,
    micro-nat rescoring, the explicit pruning round, and the final
    E-step's model table.  A genuinely independent second algorithm
    (positional SQL recursion vs the engine's Arrow DP kernel) — the
    ``bpe_train`` oracle discipline."""
    return (
        "WITH RECURSIVE\n"
        + _unigram_train_ctes(n_iters, P, n_seed, prune_to)
        + "\nSELECT piece, cnt AS freq, score AS score_micronat FROM vocabF"
    )


def unigram_encode_sql(
    n_iters: int = 2, P: int = 4, n_seed: int = 256, prune_to: int = 96
) -> str:
    """Corpus piece frequencies under the trained model.  The final
    E-step's count table IS the corpus encoding aggregated (encode
    Viterbi-segments every word occurrence under vocabP — exactly what
    cntF sums freq-weighted over distinct words)."""
    return (
        "WITH RECURSIVE\n"
        + _unigram_train_ctes(n_iters, P, n_seed, prune_to)
        + "\nSELECT piece AS token, cnt AS freq FROM cntF"
    )


def bpe_train_sql(n_merges: int = 8) -> str:
    """Full relational replay of ``bpe.bpe_train`` — the learned merge
    table ``(rank, lhs, rhs, merged, pair_count)``."""
    ctes = _BPE_WORDS_CTE + "".join(
        "," + _bpe_iter_ctes(k) for k in range(1, n_merges + 1)
    )
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS rank, l AS lhs, r AS rhs,"
        f" l || r AS merged, cnt AS pair_count FROM best{k}"
        for k in range(1, n_merges + 1)
    )
    return f"WITH {ctes}\n{rows}"


def bpe_encode_sql(n_merges: int = 8) -> str:
    """Corpus token frequencies under the learned merges.  The train
    replay's final state table IS the encoding of every in-vocab word
    (one greedy sweep per rank — see xesmf_spark/bpe.py for why that
    equals priority-order encoding), so corpus token frequency =
    SUM(word freq) grouped by final symbol."""
    ctes = _BPE_WORDS_CTE + "".join(
        "," + _bpe_iter_ctes(k) for k in range(1, n_merges + 1)
    )
    return (
        f"WITH {ctes}\n"
        f"SELECT sym AS token, CAST(SUM(freq) AS BIGINT) AS freq\n"
        f"FROM step{n_merges} GROUP BY sym"
    )


def cdc_chunks_sql(window: int = 3, divisor: int = 8) -> str:
    """Mirrors pipeline.cdc_chunks over the planted-duplicates corpus:
    boundary after 0-based token i (i in [window-1, n-2]) iff
    base_hash(window ending at i) %% divisor == 0; chunks are the
    spans between boundaries; n_copies is a corpus-wide window count
    on the chunk content hash. All hashes are md5-derived BIGINTs —
    bit-identical across engines; positions are replayed with
    range()+list_transform (0-based j, matching Spark's 0-based
    sequence), not WITH ORDINALITY (absent in DuckDB 1.0)."""
    return f"""
WITH
{_docs_cte(True)},
{NORM_CTE},
b AS (
  SELECT doc_id, t, len(t) AS n,
         list_filter(range({window} - 1, len(t) - 1),
                     i -> (('0x' || substr(md5(array_to_string(
                              t[i - {window} + 2 : i + 1], ' ')), 1, 15))::BIGINT
                           % {P}) % {divisor} = 0) AS bpos
  FROM toks
),
spans AS (
  SELECT doc_id, t, n,
         list_concat([0], list_transform(bpos, i -> i + 1)) AS starts,
         list_concat(list_transform(bpos, i -> i + 1), [n]) AS ends
  FROM b
),
ch AS (
  SELECT doc_id, u.ci AS chunk_idx, u.nt AS n_tokens, u.h AS chunk_hash FROM (
    SELECT doc_id,
           unnest(list_transform(range(len(starts)),
                  j -> {{'ci': j,
                        'nt': CAST(ends[j + 1] - starts[j + 1] AS BIGINT),
                        'h': md5(array_to_string(
                               t[starts[j + 1] + 1 : ends[j + 1]], ' '))}})) AS u
    FROM spans
  )
)
SELECT doc_id, chunk_idx, n_tokens, chunk_hash,
       CAST(COUNT(*) OVER (PARTITION BY chunk_hash) AS BIGINT) AS n_copies
FROM ch
"""


def bigram_logprob_sql(micro: int = 1_000_000) -> str:
    """Mirrors pipeline.bigram_logprob_score: interpolated bigram
    P(w2|w1) = 0.9 * c2/c1 + 0.1 * cu/total with per-pair micro-nat
    flooring before the exact BIGINT per-doc sum. The mixture is two
    IEEE-exact divisions of exact BIGINTs, two exact multiplies and
    one add with identical association on both engines; the only libm
    call is one LN() per distinct operand bit-pattern (same ~1e-10
    boundary-risk budget as unigram_logprob_sql)."""
    return f"""
WITH
{_docs_cte(False)},
{NORM_CTE},
tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
uni AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cu FROM tok GROUP BY token),
tot AS (SELECT CAST(SUM(cu) AS BIGINT) AS total FROM uni),
bg AS (
  SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM (
    SELECT doc_id,
           unnest(list_transform(range(len(t) - 1),
                  i -> {{'w1': t[i + 1], 'w2': t[i + 2]}})) AS u
    FROM toks WHERE len(t) >= 2
  )
),
c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg GROUP BY w1),
lp AS (
  SELECT bg.doc_id,
         CAST(FLOOR({micro} * LN(
           0.9 * (CAST(c2.c2 AS DOUBLE) / CAST(c1.c1 AS DOUBLE))
           + 0.1 * (CAST(uni.cu AS DOUBLE) / CAST(tot.total AS DOUBLE))
         )) AS BIGINT) AS lp_micro
  FROM bg
  JOIN c2 USING (w1, w2)
  JOIN c1 USING (w1)
  JOIN uni ON bg.w2 = uni.token, tot
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(lp_micro) AS BIGINT) AS sum_lp_micro,
       CAST(SUM(lp_micro) AS DOUBLE) / (CAST({micro} AS DOUBLE) * COUNT(*)) AS avg_logprob
FROM lp
GROUP BY doc_id
"""


def domain_caps_sql(cap: int = 3) -> str:
    """Mirrors queries.pipeline_domain_caps: the same deterministic URL
    synthesis, the same normalization regexes (scheme/userinfo strip,
    host extract, port/trailing-dot strip, lower, www strip — every
    regex string identical to pipeline.normalized_domain; both engines
    anchor them so replace-first vs replace-all cannot diverge), then
    the ONE-STAGE row_number per domain the engine's salted two-stage
    top-k is provably equal to (any global top-cap row is in its salt
    subgroup's top-cap), then the stratified md5-threshold filter
    ({en: g, de: 80000000, default 40000000})."""
    return f"""
WITH u AS (
  SELECT doc_id, lang, n_chars,
         (CASE doc_id % 4 WHEN 0 THEN 'https://www.'
                          WHEN 1 THEN 'HTTP://'
                          WHEN 2 THEN 'https://user:pw@'
                          ELSE 'https://' END)
         || (CASE WHEN doc_id % 5 = 0 THEN upper(core) ELSE core END)
         || (CASE WHEN doc_id % 11 = 0 AND doc_id % 7 <> 0 THEN '.' ELSE '' END)
         || (CASE WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END)
         || (CASE doc_id % 3 WHEN 0 THEN '/p/' || doc_id
                             WHEN 1 THEN '?q=' || doc_id
                             ELSE '#s' END) AS url
  FROM (
    SELECT *,
           source || '.example.'
           || (CASE WHEN doc_id % 2 = 0 THEN 'com' ELSE 'org' END) AS core
    FROM documents
  )
),
nd AS (
  SELECT doc_id, lang, n_chars,
         regexp_replace(
           regexp_replace(
             lower(regexp_replace(
               regexp_extract(
                 regexp_replace(
                   regexp_replace(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://', ''),
                   '^[^/?#]*@', ''),
                 '^([^/?#]*)', 1),
               ':[0-9]+$', '')),
             '[.]$', ''),
           '^www[.]', '') AS domain
  FROM u
),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (
           PARTITION BY domain ORDER BY n_chars DESC, doc_id ASC
         ) AS domain_rank
  FROM nd
)
SELECT doc_id, domain, CAST(domain_rank AS BIGINT) AS domain_rank, lang,
       CAST(n_chars AS BIGINT) AS n_chars
FROM r
WHERE domain_rank <= {cap}
  AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
      (CASE lang WHEN 'en' THEN 'g' WHEN 'de' THEN '80000000'
                 ELSE '40000000' END)
"""


def kneser_ney_sql(micro: int = 1_000_000) -> str:
    """Mirrors pipeline.kneser_ney_logprob_score: interpolated KN
    bigram with D = 0.75 (exact binary), continuation counts from the
    bigram TYPE table, term association pinned to the engine's —
    (c2−0.75)/c1 + ((0.75·n1f)/c1)·(n1b/T) — with per-pair micro-nat
    floors before the exact BIGINT per-doc sum.  bg/c2/tt are
    MATERIALIZED (the trigram lesson: un-materialized multi-consumer
    CTEs send DuckDB's join-order enumeration off a cliff)."""
    return f"""
WITH
{_docs_cte(False)},
{NORM_CTE},
bg AS MATERIALIZED (
  SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM (
    SELECT doc_id,
           unnest(list_transform(range(len(t) - 1),
                  i -> {{'w1': t[i + 1], 'w2': t[i + 2]}})) AS u
    FROM toks WHERE len(t) >= 2
  )
),
c2 AS MATERIALIZED (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY w1, w2
),
ctx AS (
  SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS n1f
  FROM c2 GROUP BY w1
),
n1b AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b FROM c2 GROUP BY w2),
tt AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM c2),
lp AS (
  SELECT bg.doc_id,
         CAST(FLOOR({micro} * LN(
           (CAST(c2.c2 AS DOUBLE) - 0.75) / CAST(ctx.c1 AS DOUBLE)
           + ((0.75 * CAST(ctx.n1f AS DOUBLE)) / CAST(ctx.c1 AS DOUBLE))
             * (CAST(n1b.n1b AS DOUBLE) / CAST(tt.tt AS DOUBLE))
         )) AS BIGINT) AS lp_micro
  FROM bg
  JOIN c2 USING (w1, w2)
  JOIN ctx USING (w1)
  JOIN n1b USING (w2), tt
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(lp_micro) AS BIGINT) AS sum_lp_micro,
       CAST(SUM(lp_micro) AS DOUBLE) / (CAST({micro} AS DOUBLE) * COUNT(*)) AS avg_logprob
FROM lp
GROUP BY doc_id
"""


def trigram_logprob_sql(micro: int = 1_000_000) -> str:
    """Mirrors pipeline.trigram_logprob_score: Jelinek-Mercer
    interpolated trigram P(w3|w1 w2) = 0.7*c3/c12 + 0.2*c2/c1 +
    0.1*cu/total with per-triple micro-nat flooring before the exact
    BIGINT per-doc sum.  All three mixture terms are IEEE-exact
    divisions of exact BIGINTs, three exact multiplies and two adds
    with identical left association on both engines; the only libm
    call is one LN() per distinct operand bit-pattern (same ~1e-10
    boundary-risk budget as bigram_logprob_sql)."""
    return f"""
WITH
{_docs_cte(False)},
{NORM_CTE},
tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
uni AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cu FROM tok GROUP BY token),
tot AS MATERIALIZED (SELECT CAST(SUM(cu) AS BIGINT) AS total FROM uni),
bg AS MATERIALIZED (
  SELECT u.wa AS wa, u.wb AS wb FROM (
    SELECT unnest(list_transform(range(len(t) - 1),
                  i -> {{'wa': t[i + 1], 'wb': t[i + 2]}})) AS u
    FROM toks WHERE len(t) >= 2
  )
),
c2 AS (SELECT wa, wb, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY wa, wb),
c1 AS (SELECT wa, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg GROUP BY wa),
tg AS MATERIALIZED (
  SELECT doc_id, u.w1 AS w1, u.w2 AS w2, u.w3 AS w3 FROM (
    SELECT doc_id,
           unnest(list_transform(range(len(t) - 2),
                  i -> {{'w1': t[i + 1], 'w2': t[i + 2], 'w3': t[i + 3]}})) AS u
    FROM toks WHERE len(t) >= 3
  )
),
c3 AS (
  SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS c3 FROM tg GROUP BY w1, w2, w3
),
c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM tg GROUP BY w1, w2),
lp AS (
  -- tg/bg/tot are MATERIALIZED: un-materialized, DuckDB's join-order
  -- enumeration over the seven inlined relations degenerates on this
  -- shape (measured: >240 s vs 0.16 s — the BPE-replay lesson again)
  SELECT tg.doc_id,
         CAST(FLOOR({micro} * LN(
           0.7 * (CAST(c3.c3 AS DOUBLE) / CAST(c12.c12 AS DOUBLE))
           + 0.2 * (CAST(c2.c2 AS DOUBLE) / CAST(c1.c1 AS DOUBLE))
           + 0.1 * (CAST(uni.cu AS DOUBLE) / CAST(tot.total AS DOUBLE))
         )) AS BIGINT) AS lp_micro
  FROM tg
  JOIN c3 USING (w1, w2, w3)
  JOIN c12 USING (w1, w2)
  JOIN c2 ON tg.w2 = c2.wa AND tg.w3 = c2.wb
  JOIN c1 ON tg.w2 = c1.wa
  JOIN uni ON tg.w3 = uni.token, tot
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       CAST(SUM(lp_micro) AS BIGINT) AS sum_lp_micro,
       CAST(SUM(lp_micro) AS DOUBLE) / (CAST({micro} AS DOUBLE) * COUNT(*)) AS avg_logprob
FROM lp
GROUP BY doc_id
"""


def lpa_communities_sql(iters: int = 3) -> str:
    """Replays relational.label_propagation over the customer-supplier
    trade graph as a MATERIALIZED CTE chain (one votes+argmax pair per
    iteration — inlined CTEs would re-scan parquet exponentially, the
    BPE-replay lesson). Neighbor votes UNION ALL one self-vote, ties
    broken by smallest label: all-integer state, bit-exact replay."""
    parts = [
        """
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_quantity >= 50
),
sym AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0)
),
l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM sym)"""
    ]
    for k in range(1, iters + 1):
        parts.append(f""",
v{k} AS MATERIALIZED (
  SELECT node, label, COUNT(*) AS votes FROM (
    SELECT s.src AS node, l.label FROM sym s JOIN l{k - 1} l ON s.dst = l.node
    UNION ALL
    SELECT node, label FROM l{k - 1})
  GROUP BY node, label
),
l{k} AS MATERIALIZED (
  SELECT node, label FROM v{k}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY node ORDER BY votes DESC, label ASC) = 1
)""")
    parts.append(f"""
SELECT label AS community,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(node % 2) AS BIGINT) AS n_suppliers,
       CAST(SUM(node) AS BIGINT) AS node_sum,
       CAST(COUNT(*) - SUM(node % 2) AS BIGINT) AS n_customers
FROM l{iters} GROUP BY label""")
    return "".join(parts)


def trade_components_sql(iters: int = 5) -> str:
    """Replays relational.connected_components over the sparsified
    customer-supplier trade graph: one MATERIALIZED min-propagation
    CTE per round (the lpa_communities_sql discipline — inlined CTEs
    re-scan parquet exponentially), then the per-component rollup."""
    parts = [
        """
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_quantity >= 50
),
sym AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0)
),
l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS component FROM sym)"""
    ]
    for k in range(1, iters + 1):
        parts.append(f""",
l{k} AS MATERIALIZED (
  SELECT node, MIN(component) AS component FROM (
    SELECT s.src AS node, l.component FROM sym s JOIN l{k - 1} l ON s.dst = l.node
    UNION ALL
    SELECT node, component FROM l{k - 1})
  GROUP BY node
)""")
    parts.append(f"""
SELECT component,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(node % 2) AS BIGINT) AS n_suppliers,
       CAST(SUM(node) AS BIGINT) AS node_sum,
       CAST(COUNT(*) - SUM(node % 2) AS BIGINT) AS n_customers
FROM l{iters} GROUP BY component""")
    return "".join(parts)


def burst_components_sql(gap_days: int = 7) -> str:
    """Closed-form oracle for orders_burst_components: on the
    consecutive-orders-within-gap graph, converged connected
    components coincide with per-customer gaps-and-islands — a window
    running-sum of gap breaks, no graph, no iteration.  The engine
    runs the general O(log-diameter) shortcutting algorithm; the
    oracle exploits the fixture's chain structure (same discipline as
    the regrid closed-form oracles)."""
    return f"""
WITH o AS (
  SELECT o_orderkey, o_custkey, o_orderdate,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
s AS (
  SELECT *, LAG(o_orderdate) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_date
  FROM o
),
i AS (
  SELECT *, SUM(CASE WHEN prev_date IS NULL
                       OR date_diff('day', prev_date, o_orderdate) > {gap_days}
                     THEN 1 ELSE 0 END) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS UNBOUNDED PRECEDING) AS island
  FROM s
)
SELECT CAST(MIN(o_orderkey) AS BIGINT) AS component,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       MIN(o_orderdate) AS first_date,
       MAX(o_orderdate) AS last_date
FROM i
GROUP BY o_custkey, island
"""


def copurchase_triangles_sql() -> str:
    """Replays relational.triangle_count over the part co-purchase
    graph: canonicalized distinct edges, (degree, id)-ordered
    orientation, wedge join + closing-edge join — all exact BIGINTs."""
    return """
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS a,
                  greatest(a.l_partkey, b.l_partkey) AS b
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey <> b.l_partkey
),
deg AS MATERIALIZED (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT a AS node FROM e0 UNION ALL SELECT b AS node FROM e0)
  GROUP BY node
),
o AS MATERIALIZED (
  SELECT CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND e0.a < e0.b)
              THEN e0.a ELSE e0.b END AS u,
         CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND e0.a < e0.b)
              THEN e0.b ELSE e0.a END AS v
  FROM e0 JOIN deg da ON e0.a = da.node JOIN deg db ON e0.b = db.node
),
w AS (SELECT o1.u AS u, o2.v AS w FROM o o1 JOIN o o2 ON o1.v = o2.u),
t AS (SELECT COUNT(*) AS n FROM w JOIN o ON w.u = o.u AND w.w = o.v)
SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST((SELECT COUNT(*) FROM e0) AS BIGINT) AS n_edges,
       CAST((SELECT n FROM t) AS BIGINT) AS n_triangles
"""


def shared_supplier_jaccard_sql(
    max_neighbor_degree: int = 1000, min_inter: int = 2, k: int = 50
) -> str:
    """Replays relational.shared_neighbor_jaccard on the sparsified
    customer-supplier graph: valve-bounded shared-neighbor candidate
    generation, exact intersection re-count over the unfiltered edge
    set, exact integer micro-Jaccard, deterministic top-k."""
    return f"""
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_quantity >= 50
),
rdeg AS (SELECT dst, COUNT(*) AS c FROM e0 GROUP BY dst),
sizes AS (SELECT src, COUNT(*) AS n FROM e0 GROUP BY src),
gen AS (
  SELECT e0.src, e0.dst FROM e0 JOIN rdeg USING (dst)
  WHERE rdeg.c <= {max_neighbor_degree}
),
cand AS MATERIALIZED (
  SELECT x.src AS src_a, y.src AS src_b
  FROM gen x JOIN gen y ON x.dst = y.dst AND x.src < y.src
  GROUP BY 1, 2
  HAVING COUNT(*) >= {min_inter}
),
pairs AS (
  SELECT c.src_a, c.src_b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM cand c
  JOIN e0 ea ON ea.src = c.src_a
  JOIN e0 eb ON eb.src = c.src_b AND eb.dst = ea.dst
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_inter,
       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
       (1000000 * n_inter) // (sa.n + sb.n - n_inter) AS jaccard_micro
FROM pairs
JOIN sizes sa ON src_a = sa.src
JOIN sizes sb ON src_b = sb.src
ORDER BY jaccard_micro DESC, src_a ASC, src_b ASC
LIMIT {k}
"""


def pmi_collocations_sql(min_count: int = 5, micro: int = 1_000_000) -> str:
    """Mirrors pipeline.pmi_collocations: the PMI ratio evaluated as
    ((c2 * N1) * N1) / ((N2 * cu1) * cu2) in doubles with identical
    association on both engines, floored to micro-nats."""
    return f"""
WITH
{_docs_cte(False)},
{NORM_CTE},
tok AS (SELECT unnest(t) AS token FROM toks),
uni AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cu FROM tok GROUP BY token),
n1 AS (SELECT CAST(SUM(cu) AS BIGINT) AS n1 FROM uni),
bg AS (
  SELECT u.w1 AS w1, u.w2 AS w2 FROM (
    SELECT unnest(list_transform(range(len(t) - 1),
                  i -> {{'w1': t[i + 1], 'w2': t[i + 2]}})) AS u
    FROM toks WHERE len(t) >= 2
  )
),
n2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n2 FROM bg),
c2 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair FROM bg
  GROUP BY w1, w2 HAVING COUNT(*) >= {min_count}
)
SELECT c2.w1, c2.w2, n_pair,
       CAST(FLOOR({micro} * LN(
         ((CAST(n_pair AS DOUBLE) * CAST(n1.n1 AS DOUBLE)) * CAST(n1.n1 AS DOUBLE))
         / ((CAST(n2.n2 AS DOUBLE) * CAST(u1.cu AS DOUBLE)) * CAST(u2.cu AS DOUBLE))
       )) AS BIGINT) AS pmi_micro
FROM c2
JOIN uni u1 ON c2.w1 = u1.token
JOIN uni u2 ON c2.w2 = u2.token, n1, n2
"""


def copurchase_clustering_sql() -> str:
    """Replays relational.clustering_coefficient over the part
    co-purchase graph: the triangle replay keeping the full (u, v, w)
    triple, exploded to its three vertices, counted per node, then
    2e6*t // (deg*(deg-1)) exact integer coefficients."""
    return """
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS a,
                  greatest(a.l_partkey, b.l_partkey) AS b
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey <> b.l_partkey
),
deg AS MATERIALIZED (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT a AS node FROM e0 UNION ALL SELECT b AS node FROM e0)
  GROUP BY node
),
o AS MATERIALIZED (
  SELECT CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND e0.a < e0.b)
              THEN e0.a ELSE e0.b END AS u,
         CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND e0.a < e0.b)
              THEN e0.b ELSE e0.a END AS v
  FROM e0 JOIN deg da ON e0.a = da.node JOIN deg db ON e0.b = db.node
),
tri AS MATERIALIZED (
  SELECT wg.u AS u, wg.v AS v, wg.w AS w FROM (
    SELECT o1.u AS u, o1.v AS v, o2.v AS w
    FROM o o1 JOIN o o2 ON o1.v = o2.u) wg
  JOIN o ON wg.u = o.u AND wg.w = o.v
),
nt AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
    SELECT unnest([u, v, w]) AS node FROM tri)
  GROUP BY node
)
SELECT deg.node, deg.deg,
       COALESCE(nt.n_tri, 0) AS n_tri,
       CASE WHEN deg.deg >= 2
            THEN (2000000 * COALESCE(nt.n_tri, 0)) // (deg.deg * (deg.deg - 1))
            ELSE 0 END AS coeff_micro
FROM deg LEFT JOIN nt USING (node)
"""


def psi_drift_sql(
    lo: int = 0, width: int = 5_000_000, nbins: int = 10, micro: int = 1_000_000
) -> str:
    """Mirrors quality.psi_drift over the orders value split: same
    clamp-binning as histogram_rollup, Laplace +1 smoothing, the PSI
    term evaluated as (p - q) * LN(p / q) with identical association,
    micro-floored per bin before the exact BIGINT total."""
    return f"""
WITH o AS (
  SELECT o_orderdate,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
hb AS (
  SELECT least(greatest((cents - {lo}) // {width}, 0), {nbins} - 1) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n_base
  FROM o WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1
),
hn AS (
  SELECT least(greatest((cents - {lo}) // {width}, 0), {nbins} - 1) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n_new
  FROM o WHERE o_orderdate >= TIMESTAMP '1998-01-01' GROUP BY 1
),
nb AS (SELECT CAST(COALESCE(SUM(n_base), 0) AS BIGINT) AS t FROM hb),
nn AS (SELECT CAST(COALESCE(SUM(n_new), 0) AS BIGINT) AS t FROM hn),
bins AS (SELECT CAST(b.range AS BIGINT) AS bin FROM range(0, {nbins}) b),
terms AS (
  SELECT bins.bin,
         COALESCE(hb.n_base, 0) AS n_base,
         COALESCE(hn.n_new, 0) AS n_new,
         CAST(FLOOR({micro} * (
           ((CAST(COALESCE(hb.n_base, 0) + 1 AS DOUBLE)
             / CAST(nb.t + {nbins} AS DOUBLE))
            - (CAST(COALESCE(hn.n_new, 0) + 1 AS DOUBLE)
               / CAST(nn.t + {nbins} AS DOUBLE)))
           * LN((CAST(COALESCE(hb.n_base, 0) + 1 AS DOUBLE)
                 / CAST(nb.t + {nbins} AS DOUBLE))
                / (CAST(COALESCE(hn.n_new, 0) + 1 AS DOUBLE)
                   / CAST(nn.t + {nbins} AS DOUBLE)))
         )) AS BIGINT) AS term_micro
  FROM bins LEFT JOIN hb USING (bin) LEFT JOIN hn USING (bin), nb, nn
)
SELECT bin, n_base, n_new, term_micro,
       CAST(SUM(term_micro) OVER () AS BIGINT) AS psi_micro
FROM terms
"""


def psi_drift_events_sql(
    lo: int = 0, width: int = 5_000, nbins: int = 10, micro: int = 1_000_000
) -> str:
    """Mirrors stream_psi_drift: the streamed 4-batch histogram
    maintenance equals a from-scratch batch histogram (sum-mergeable
    integer counts), so the oracle IS the batch PSI of purchase-value
    vs click-value cents — same clamp-binning, Laplace smoothing and
    micro-floored terms as psi_drift_sql."""
    return f"""
WITH e AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
hb AS (
  SELECT least(greatest((cents - {lo}) // {width}, 0), {nbins} - 1) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n_base
  FROM e WHERE event_type = 'click' GROUP BY 1
),
hn AS (
  SELECT least(greatest((cents - {lo}) // {width}, 0), {nbins} - 1) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n_new
  FROM e WHERE event_type = 'purchase' GROUP BY 1
),
nb AS (SELECT CAST(COALESCE(SUM(n_base), 0) AS BIGINT) AS t FROM hb),
nn AS (SELECT CAST(COALESCE(SUM(n_new), 0) AS BIGINT) AS t FROM hn),
bins AS (SELECT CAST(b.range AS BIGINT) AS bin FROM range(0, {nbins}) b),
terms AS (
  SELECT bins.bin,
         COALESCE(hb.n_base, 0) AS n_base,
         COALESCE(hn.n_new, 0) AS n_new,
         CAST(FLOOR({micro} * (
           ((CAST(COALESCE(hb.n_base, 0) + 1 AS DOUBLE)
             / CAST(nb.t + {nbins} AS DOUBLE))
            - (CAST(COALESCE(hn.n_new, 0) + 1 AS DOUBLE)
               / CAST(nn.t + {nbins} AS DOUBLE)))
           * LN((CAST(COALESCE(hb.n_base, 0) + 1 AS DOUBLE)
                 / CAST(nb.t + {nbins} AS DOUBLE))
                / (CAST(COALESCE(hn.n_new, 0) + 1 AS DOUBLE)
                   / CAST(nn.t + {nbins} AS DOUBLE)))
         )) AS BIGINT) AS term_micro
  FROM bins LEFT JOIN hb USING (bin) LEFT JOIN hn USING (bin), nb, nn
)
SELECT bin, n_base, n_new, term_micro,
       CAST(SUM(term_micro) OVER () AS BIGINT) AS psi_micro
FROM terms
"""


def ks_drift_sql(micro: int = 1_000_000) -> str:
    """Mirrors orders_ks_drift with the NAIVE global-window cumulative
    scan (the formulation the engine's two-phase decomposition must
    equal): per-distinct-value counts, one ordered cumsum each side,
    cross-multiplied BIGINT diff, smallest argmax value."""
    return f"""
WITH src AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS isb
  FROM orders
),
per AS (
  SELECT v, CAST(SUM(isb) AS BIGINT) AS db,
         CAST(SUM(1 - isb) AS BIGINT) AS dn
  FROM src GROUP BY v
),
tot AS (
  SELECT CAST(SUM(db) AS BIGINT) AS nb, CAST(SUM(dn) AS BIGINT) AS nn FROM per
),
cum AS (
  SELECT v,
         SUM(db) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
         SUM(dn) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
  FROM per
),
scored AS (
  SELECT v, ABS(nn * cb - nb * cn) AS diff, nb, nn FROM cum, tot
)
SELECT nb AS n_base, nn AS n_new, v AS at_value,
       CAST(diff AS BIGINT) AS ks_num,
       CAST(({micro} * diff) // (nb * nn) AS BIGINT) AS ks_micro
FROM scored ORDER BY diff DESC, v ASC LIMIT 1
"""


def w1_drift_sql(micro: int = 1_000_000) -> str:
    """Mirrors orders_w1_drift with the NAIVE global-window scan: one
    ordered cumsum + LEAD over ALL distinct values (the formulation
    the engine's bucketed decomposition must equal), gap-weighted sum
    of cross-multiplied CDF diffs, split floor division for the micro
    scale (DuckDB sums into HUGEINT; the split keeps the arithmetic
    identical to the engine's BIGINT path)."""
    return f"""
WITH src AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS isb
  FROM orders
),
per AS (
  SELECT v, CAST(SUM(isb) AS BIGINT) AS db,
         CAST(SUM(1 - isb) AS BIGINT) AS dn
  FROM src GROUP BY v
),
tot AS (
  SELECT CAST(SUM(db) AS BIGINT) AS nb, CAST(SUM(dn) AS BIGINT) AS nn FROM per
),
cum AS (
  SELECT v,
         SUM(db) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
         SUM(dn) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
         LEAD(v) OVER (ORDER BY v) AS nxt
  FROM per
),
agg AS (
  SELECT CAST(SUM(ABS(nn * cb - nb * cn) * (nxt - v)) AS BIGINT) AS w1_num,
         MAX(nb) AS nb, MAX(nn) AS nn
  FROM cum, tot WHERE nxt IS NOT NULL
)
SELECT nb AS n_base, nn AS n_new, w1_num,
       CAST({micro} * (w1_num // (nb * nn))
            + ({micro} * (w1_num % (nb * nn))) // (nb * nn)
            AS BIGINT) AS w1_micro
FROM agg
"""


def hybrid_rrf_sql(leg_k: int = 5, k_rrf: int = 60, topk: int = 3) -> str:
    """Mirrors documents_hybrid_rrf: shared-shingle lexical top-5 (hot
    -shingle valve <= 100 docs) + exact cosine top-5, fused by exact
    integer 1e9 // (60 + rank) points, per-query top-3."""
    dot = _DOT.format(a="q", b="p")
    return f"""
WITH
docs AS (SELECT doc_id, text FROM documents),
{NORM_CTE},
{SHINGLE_CTE},
shx AS (SELECT doc_id, unnest(sh_set) AS shingle FROM sh),
ok AS (
  SELECT shingle FROM shx GROUP BY shingle
  HAVING COUNT(DISTINCT doc_id) <= 100
),
shf AS (SELECT s.doc_id, s.shingle FROM shx s JOIN ok USING (shingle)),
lpairs AS (
  SELECT a.doc_id AS query_id, b.doc_id AS neighbor_id,
         CAST(COUNT(*) AS BIGINT) AS shared
  FROM shf a JOIN shf b USING (shingle)
  WHERE a.doc_id <> b.doc_id
  GROUP BY 1, 2
),
lex AS (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY shared DESC, neighbor_id ASC) AS rank
    FROM lpairs
  ) WHERE rank <= {leg_k}
),
{_VEC_CTE},
cpairs AS (
  SELECT q.id AS query_id, p.id AS neighbor_id,
         ROUND({dot} / (q.nrm * p.nrm), 6) AS cosine
  FROM v q CROSS JOIN v p
  WHERE q.id != p.id
),
sem AS (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM cpairs
  ) WHERE rank <= {leg_k}
),
legs AS (SELECT * FROM lex UNION ALL SELECT * FROM sem),
fused AS (
  SELECT query_id, neighbor_id,
         CAST(SUM(1000000000 // ({k_rrf} + rank)) AS BIGINT) AS rrf_score
  FROM legs GROUP BY 1, 2
)
SELECT query_id, neighbor_id, rrf_score, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY rrf_score DESC, neighbor_id ASC) AS rank
  FROM fused
) WHERE rank <= {topk}
"""


def mixture_sample_sql(total: int = 200) -> str:
    """Mirrors pipeline.mixture_sample over the documents table:
    α=0.5 tempered masses (sqrt is IEEE correctly rounded — the one
    float step), integer Hamilton apportionment, per-source
    smallest-(wide_hash, id) selection; a starved source yields what
    it has (implicit rank cap, no redistribution)."""
    return f"""
WITH masses AS MATERIALIZED (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS m
  FROM documents GROUP BY source
),
w AS MATERIALIZED (
  SELECT source,
         CAST(FLOOR(sqrt(CAST(m AS DOUBLE)) * 1000000) AS BIGINT) AS wi
  FROM masses
),
tot AS MATERIALIZED (SELECT CAST(SUM(wi) AS BIGINT) AS bw FROM w),
q0 AS MATERIALIZED (
  SELECT source, ({total} * wi) // bw AS q, ({total} * wi) % bw AS rem
  FROM w, tot
),
quota AS MATERIALIZED (
  SELECT source,
         q + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC)
                    <= {total} - (SELECT CAST(SUM(q) AS BIGINT) FROM q0)
              THEN 1 ELSE 0 END AS quota
  FROM q0
),
ranked AS MATERIALIZED (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                    doc_id
         ) AS rk
  FROM documents
)
SELECT r.doc_id, r.source
FROM ranked r JOIN quota q USING (source)
WHERE r.rk <= q.quota
"""


def sq8_topk_sql(k: int = 3) -> str:
    """Mirrors ann_sq8_top3: per-dim min/span stats, the IDENTICAL
    affine floor expression producing the 8-bit codes, then exact
    integer squared-L2 ranking (d2 is a plain BIGINT sum — no rounding
    quantum). The pairwise join explodes per dimension (n²·dim rows) —
    the naive formulation the engine's GEMM must equal."""
    return f"""
WITH v AS (SELECT vec_id AS id, embedding AS vv FROM embeddings),
ex AS (
  SELECT id, i, vv[i + 1]::DOUBLE AS x
  FROM v, UNNEST(range(len(vv))) AS t(i)
),
stats AS (
  SELECT i, MIN(x) AS mn, MAX(x) - MIN(x) AS span FROM ex GROUP BY i
),
codes AS (
  SELECT id, ex.i,
         CASE WHEN span > 0.0
              THEN LEAST(255, CAST(FLOOR(((x - mn) * 255.0) / span) AS BIGINT))
              ELSE 0 END AS c
  FROM ex JOIN stats ON ex.i = stats.i
),
d AS (
  SELECT a.id AS query_id, b.id AS neighbor_id,
         CAST(SUM((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS d2
  FROM codes a JOIN codes b ON a.i = b.i AND a.id != b.id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, d2, rank FROM (
  SELECT query_id, neighbor_id, d2,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
           ORDER BY d2 ASC, neighbor_id ASC) AS INT) AS rank
  FROM d
) WHERE rank <= {k}
"""


def textrank_sql(iters: int = 3, k: int = 20) -> str:
    """Mirrors documents_textrank: tokenize + adjacency + candidate
    filter, symmetrized distinct edges, then the unrolled integer
    PageRank replay (same recurrence text as nations_trade_pagerank,
    teleport terms kept although the symmetric graph has no dangling
    nodes), top-k by (rank DESC, token ASC)."""
    from xesmf_spark.pipeline import STOPWORDS

    stoplist = "(" + ", ".join(f"'{s}'" for s in STOPWORDS) + ")"
    parts = [
        f"""
WITH docs AS (SELECT doc_id, text FROM documents),
{NORM_CTE},
tok_idx AS (
  SELECT doc_id, i, t[CAST(i AS INT) + 1] AS tok
  FROM toks, UNNEST(range(len(t))) AS u2(i)
),
adj AS (
  SELECT a.tok AS u, b.tok AS v
  FROM tok_idx a JOIN tok_idx b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  WHERE length(a.tok) >= 3 AND length(b.tok) >= 3
    AND a.tok NOT IN {stoplist} AND b.tok NOT IN {stoplist}
    AND a.tok != b.tok
),
e AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT u AS src, v AS dst FROM adj
    UNION ALL SELECT v AS src, u AS dst FROM adj
  )
),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
r0 AS MATERIALIZED (
  SELECT node, 1000000 // (SELECT COUNT(*) FROM nodes) AS r FROM nodes
)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
d{t - 1} AS MATERIALIZED (
  SELECT COALESCE(SUM(r), 0) AS dang FROM r{t - 1}
  WHERE node NOT IN (SELECT src FROM outdeg)
),
r{t} AS MATERIALIZED (
  SELECT nd.node,
         (1000000 - 850000) // (SELECT COUNT(*) FROM nodes)
           + COALESCE(c.s, 0)
           + ((SELECT dang FROM d{t - 1}) * 850000)
             // (1000000 * (SELECT COUNT(*) FROM nodes)) AS r
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node,
           CAST(SUM((r.r * 850000) // (1000000 * o.d)) AS BIGINT) AS s
    FROM e JOIN outdeg o ON e.src = o.src JOIN r{t - 1} r ON r.node = e.src
    GROUP BY e.dst) c ON nd.node = c.node
)"""
        )
    parts.append(
        f"""
SELECT node AS token, CAST(r AS BIGINT) AS rank_micro
FROM r{iters} ORDER BY r DESC, node ASC LIMIT {k}
"""
    )
    return "".join(parts)


def mmr_topk_sql(
    k: int = 3, pool_k: int = 8, lam: int = 500_000
) -> str:
    """Mirrors ann_mmr_top3: cosine top-``pool_k`` candidates, round-6
    cosines lifted to BIGINT micro units, then the greedy MMR loop
    UNROLLED step by step (argmax per query via ROW_NUMBER, max-sim
    over the selected set via GREATEST) — exact integer comparisons
    throughout, empty-selection max = 0."""
    if k != 3:
        raise ValueError("the unrolled replay is written for k=3")
    inv = 1_000_000 - lam
    dot = _DOT.format(a="va", b="vb")
    return f"""
WITH
{_VEC_CTE},
topk AS ({ann_cosine_topk_sql(k=pool_k)}),
cand AS (
  SELECT query_id, neighbor_id,
         CAST(ROUND(cosine * 1000000.0, 0) AS BIGINT) AS rel
  FROM topk
),
sims AS (
  SELECT c1.query_id, c1.neighbor_id AS a, c2.neighbor_id AS b,
         CAST(ROUND(ROUND({dot} / (va.nrm * vb.nrm), 6) * 1000000.0, 0)
              AS BIGINT) AS sim
  FROM cand c1
  JOIN cand c2 ON c1.query_id = c2.query_id
              AND c1.neighbor_id != c2.neighbor_id
  JOIN v va ON va.id = c1.neighbor_id
  JOIN v vb ON vb.id = c2.neighbor_id
),
s1 AS (
  SELECT query_id, neighbor_id, {lam} * rel AS score FROM (
    SELECT query_id, neighbor_id, rel,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY {lam} * rel DESC, neighbor_id ASC) AS rn
    FROM cand
  ) WHERE rn = 1
),
sc2 AS (
  SELECT c.query_id, c.neighbor_id,
         {lam} * c.rel - {inv} * x1.sim AS score
  FROM cand c
  JOIN s1 ON c.query_id = s1.query_id AND c.neighbor_id != s1.neighbor_id
  JOIN sims x1 ON x1.query_id = c.query_id
              AND x1.a = c.neighbor_id AND x1.b = s1.neighbor_id
),
s2 AS (
  SELECT query_id, neighbor_id, score FROM (
    SELECT query_id, neighbor_id, score,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY score DESC, neighbor_id ASC) AS rn
    FROM sc2
  ) WHERE rn = 1
),
sc3 AS (
  SELECT c.query_id, c.neighbor_id,
         {lam} * c.rel - {inv} * GREATEST(x1.sim, x2.sim) AS score
  FROM cand c
  JOIN s1 ON c.query_id = s1.query_id AND c.neighbor_id != s1.neighbor_id
  JOIN s2 ON c.query_id = s2.query_id AND c.neighbor_id != s2.neighbor_id
  JOIN sims x1 ON x1.query_id = c.query_id
              AND x1.a = c.neighbor_id AND x1.b = s1.neighbor_id
  JOIN sims x2 ON x2.query_id = c.query_id
              AND x2.a = c.neighbor_id AND x2.b = s2.neighbor_id
),
s3 AS (
  SELECT query_id, neighbor_id, score FROM (
    SELECT query_id, neighbor_id, score,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY score DESC, neighbor_id ASC) AS rn
    FROM sc3
  ) WHERE rn = 1
)
SELECT query_id, neighbor_id, score AS mmr_score, CAST(1 AS INT) AS rank FROM s1
UNION ALL
SELECT query_id, neighbor_id, score, CAST(2 AS INT) FROM s2
UNION ALL
SELECT query_id, neighbor_id, score, CAST(3 AS INT) FROM s3
"""


def pagerank_weighted_sql(iters: int = 3, damp: int = 850_000) -> str:
    """Mirrors nations_trade_pagerank_weighted: unrolled replay of the
    quantity-weighted recurrence with the SAME divide-then-multiply
    share ordering (((r·damp) // 1e6) · w) // W_src — truncating
    division on positive BIGINTs both engines."""
    parts = [
        f"""
WITH e AS MATERIALIZED (
  SELECT s_nationkey AS src, c_nationkey AS dst,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2
),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
wout AS MATERIALIZED (
  SELECT src, CAST(SUM(w) AS BIGINT) AS wout FROM e GROUP BY src
),
r0 AS MATERIALIZED (
  SELECT node, 1000000 // (SELECT COUNT(*) FROM nodes) AS r FROM nodes
)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
d{t - 1} AS MATERIALIZED (
  SELECT COALESCE(SUM(r), 0) AS dang FROM r{t - 1}
  WHERE node NOT IN (SELECT src FROM wout)
),
r{t} AS MATERIALIZED (
  SELECT nd.node,
         (1000000 - {damp}) // (SELECT COUNT(*) FROM nodes)
           + COALESCE(c.s, 0)
           + ((SELECT dang FROM d{t - 1}) * {damp})
             // (1000000 * (SELECT COUNT(*) FROM nodes)) AS r
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node,
           CAST(SUM((((r.r * {damp}) // 1000000) * e.w) // o.wout)
                AS BIGINT) AS s
    FROM e JOIN wout o ON e.src = o.src JOIN r{t - 1} r ON r.node = e.src
    GROUP BY e.dst) c ON nd.node = c.node
)"""
        )
    parts.append(
        f"""
SELECT n_name, CAST(r AS BIGINT) AS rank_micro
FROM r{iters} JOIN nation ON node = n_nationkey
"""
    )
    return "".join(parts)


def hits_sql(iters: int = 3) -> str:
    """Mirrors nations_trade_hits: unrolled-CTE replay of the
    fixed-iteration integer micro-unit HITS recurrence (L1
    normalization by truncating division — both engines positive
    BIGINTs). CTEs MATERIALIZED: each half-step is referenced by the
    next one AND by its own normalization scalar, so un-materialized
    inlining doubles per reference (the bpe_train oracle lesson)."""
    parts = [
        """
WITH e AS MATERIALIZED (
  SELECT DISTINCT s_nationkey AS src, c_nationkey AS dst
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
h0 AS MATERIALIZED (
  SELECT node, 1000000 // (SELECT COUNT(*) FROM nodes) AS s FROM nodes
)"""
    ]
    prev_h = "h0"
    for t in range(1, iters + 1):
        parts.append(
            f""",
ar{t} AS MATERIALIZED (
  SELECT nd.node, COALESCE(c.sm, 0) AS raw
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM(h.s) AS BIGINT) AS sm
    FROM e JOIN {prev_h} h ON h.node = e.src GROUP BY e.dst) c
  ON nd.node = c.node
),
a{t} AS MATERIALIZED (
  SELECT node,
         (raw * 1000000) // (SELECT CAST(SUM(raw) AS BIGINT) FROM ar{t}) AS s
  FROM ar{t}
),
hr{t} AS MATERIALIZED (
  SELECT nd.node, COALESCE(c.sm, 0) AS raw
  FROM nodes nd LEFT JOIN (
    SELECT e.src AS node, CAST(SUM(a.s) AS BIGINT) AS sm
    FROM e JOIN a{t} a ON a.node = e.dst GROUP BY e.src) c
  ON nd.node = c.node
),
h{t} AS MATERIALIZED (
  SELECT node,
         (raw * 1000000) // (SELECT CAST(SUM(raw) AS BIGINT) FROM hr{t}) AS s
  FROM hr{t}
)"""
        )
        prev_h = f"h{t}"
    parts.append(
        f"""
SELECT n_name,
       CAST(a.s AS BIGINT) AS auth_micro,
       CAST(h.s AS BIGINT) AS hub_micro
FROM a{iters} a JOIN h{iters} h USING (node)
JOIN nation ON node = n_nationkey
"""
    )
    return "".join(parts)


def shortest_paths_sql(iters: int = 4) -> str:
    """Replays relational.shortest_paths over the sparsified weighted
    trade graph as a MATERIALIZED CTE chain: cents weights (parallel
    edges pre-collapsed by MIN), symmetrized, hub-customer sources,
    one min-plus relaxation round per CTE — the round-``iters`` state
    exactly (cheapest <= iters-hop path; unreached nodes absent)."""
    parts = [
        """
WITH e0 AS MATERIALIZED (
  SELECT src, dst, MIN(w) AS w FROM (
    SELECT src, dst, w FROM (
      SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_quantity >= 50
    )
    UNION ALL
    SELECT dst AS src, src AS dst, w FROM (
      SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_quantity >= 50
    )
  ) GROUP BY src, dst
),
d0 AS MATERIALIZED (
  SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
  FROM e0 WHERE src % 194 = 0
)"""
    ]
    for r in range(1, iters + 1):
        parts.append(f""",
d{r} AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT e.dst AS node, d.dist + e.w AS dist
    FROM e0 e JOIN d{r - 1} d ON e.src = d.node
    UNION ALL
    SELECT node, dist FROM d{r - 1}
  ) GROUP BY node
)""")
    parts.append(f"""
SELECT node, dist FROM d{iters}""")
    return "".join(parts)


def kcore_sql(k: int = 3, iters: int = 3) -> str:
    """Replays relational.kcore_nodes over the sparsified trade graph
    as a MATERIALIZED CTE chain: per round a degree count and a
    both-ends survivor filter — the round-``iters`` state exactly (not
    the fixed point), matching the engine's fixed-iteration contract."""
    parts = [
        """
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_quantity >= 50
),
a0 AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0)
)"""
    ]
    for r in range(1, iters + 1):
        parts.append(f""",
k{r} AS MATERIALIZED (
  SELECT src AS node FROM a{r - 1} GROUP BY src HAVING COUNT(*) >= {k}
),
a{r} AS MATERIALIZED (
  SELECT a.src, a.dst FROM a{r - 1} a
  JOIN k{r} x ON a.src = x.node
  JOIN k{r} y ON a.dst = y.node
)""")
    parts.append(f"""
SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
FROM a{iters} GROUP BY src""")
    return "".join(parts)


def skyline_sql() -> str:
    """Mirrors parts_skyline: the textbook NOT-EXISTS skyline — q
    strictly dominates p iff q is <= on price, >= on size, and
    strictly better on at least one.  Comparisons only, so the
    frontier SET is engine-exact (identical criterion vectors survive
    together, the standard tie rule)."""
    return """
SELECT p.p_partkey, p.p_retailprice, p.p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice
    AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
"""


def basket_rules_sql(min_support: int = 5) -> str:
    """Mirrors parts_basket_rules: (order, brand) dedup, basket-keyed
    ordered pair counts, support/confidence/lift in exact micro units
    (truncating // on positive BIGINTs; intermediate
    1e6*support*N <= ~1e6*N^2 fits BIGINT at any SF this box holds —
    cast back from DuckDB's HUGEINT sums)."""
    return f"""
WITH bi AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS b, p_brand AS i
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
itemn AS MATERIALIZED (SELECT i, COUNT(*) AS cnt FROM bi GROUP BY i),
tot AS MATERIALIZED (SELECT COUNT(DISTINCT b) AS n FROM bi),
pairs AS MATERIALIZED (
  SELECT a.i AS item_a, c.i AS item_b, COUNT(*) AS support
  FROM bi a JOIN bi c ON a.b = c.b AND a.i <> c.i
  GROUP BY 1, 2
  HAVING COUNT(*) >= {min_support}
)
SELECT item_a, item_b, CAST(support AS BIGINT) AS support,
       CAST((1000000 * support) // na.cnt AS BIGINT) AS conf_micro,
       CAST((1000000 * support * (SELECT n FROM tot))
            // (na.cnt * nb.cnt) AS BIGINT) AS lift_micro
FROM pairs
JOIN itemn na ON item_a = na.i
JOIN itemn nb ON item_b = nb.i
"""


def record_linkage_sql(min_score: int = 900_000) -> str:
    """Mirrors customers_record_linkage: composite-key blocked pairs,
    graded Levenshtein name term ((maxlen-lev)*700000 // maxlen) plus
    exact acct-bucket term (+300000) — all BIGINT; the negative-
    balance bucket division truncates toward zero in both engines."""
    return f"""
WITH c AS MATERIALIZED (
  SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) // 100000
           AS ab
  FROM customer
)
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(((GREATEST(LENGTH(a.c_name), LENGTH(b.c_name))
              - levenshtein(a.c_name, b.c_name)) * 700000)
            // GREATEST(LENGTH(a.c_name), LENGTH(b.c_name))
            + CASE WHEN a.ab = b.ab THEN 300000 ELSE 0 END
            AS BIGINT) AS score_micro
FROM c a JOIN c b
  ON a.c_nationkey = b.c_nationkey
 AND a.c_mktsegment = b.c_mktsegment
 AND a.c_custkey < b.c_custkey
WHERE ((GREATEST(LENGTH(a.c_name), LENGTH(b.c_name))
        - levenshtein(a.c_name, b.c_name)) * 700000)
      // GREATEST(LENGTH(a.c_name), LENGTH(b.c_name))
      + CASE WHEN a.ab = b.ab THEN 300000 ELSE 0 END >= {min_score}
"""


def seasonal_decompose_sql(period: int = 5) -> str:
    """Mirrors orders_seasonal_decompose: weekly cents rollup, RANGE
    centered moving average (full-frame rows only), per-phase
    uncentered seasonal means, residual — every division a truncating
    integer // (negative detrended values truncate toward zero in both
    engines, verified; DuckDB HUGEINT sums cast back to BIGINT)."""
    half = (period - 1) // 2
    return f"""
WITH r AS MATERIALIZED (
  SELECT o_orderpriority,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) // 7
           AS wk,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
),
t AS MATERIALIZED (
  SELECT o_orderpriority, wk, cents * 1000000 AS x,
         CAST(SUM(cents * 1000000) OVER w AS BIGINT) AS fsum,
         COUNT(*) OVER w AS fn
  FROM r
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY wk
               RANGE BETWEEN {half} PRECEDING AND {half} FOLLOWING)
),
d AS MATERIALIZED (
  SELECT o_orderpriority, wk, x,
         fsum // {period} AS trend_micro,
         wk % {period} AS phase,
         x - fsum // {period} AS det
  FROM t WHERE fn = {period}
),
s AS MATERIALIZED (
  SELECT o_orderpriority, phase,
         CAST(SUM(det) // COUNT(*) AS BIGINT) AS seasonal_micro
  FROM d GROUP BY 1, 2
)
SELECT d.o_orderpriority, d.wk,
       CAST(d.trend_micro AS BIGINT) AS trend_micro,
       s.seasonal_micro,
       CAST(d.det - s.seasonal_micro AS BIGINT) AS resid_micro
FROM d JOIN s ON d.o_orderpriority = s.o_orderpriority AND d.phase = s.phase
"""


def cusum_changepoint_sql() -> str:
    """Mirrors events_cusum_changepoint: pinned integer mean
    (SUM(1e6*cents) // n, truncating), ordered cumulative deviation
    sum, argmax of |S(t)| with earliest-day ties — all BIGINT."""
    return """
WITH r AS MATERIALIZED (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
m AS MATERIALIZED (
  SELECT event_type,
         CAST(SUM(cents * 1000000) // COUNT(*) AS BIGINT) AS mean_micro,
         COUNT(*) AS n_buckets
  FROM r GROUP BY 1
),
cum AS MATERIALIZED (
  SELECT r.event_type, r.day, m.n_buckets,
         CAST(SUM(r.cents * 1000000 - m.mean_micro)
              OVER (PARTITION BY r.event_type ORDER BY r.day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cusum_micro
  FROM r JOIN m ON r.event_type = m.event_type
),
rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY ABS(cusum_micro) DESC, day ASC) AS rn
  FROM cum
)
SELECT event_type, day AS cp_bucket, cusum_micro,
       CAST(n_buckets AS BIGINT) AS n_buckets
FROM rk WHERE rn = 1
"""


_RP_PROJ_CTES = """
rpex AS MATERIALIZED (
  SELECT vec_id, i AS d,
         CAST(FLOOR(1000000.0 * embedding[CAST(i + 1 AS INT)]::DOUBLE)
              AS BIGINT) AS xm
  FROM embeddings, unnest(range({in_dim})) AS t(i)
  WHERE {where}
),
rproj AS MATERIALIZED (
  SELECT vec_id, j,
         CAST(SUM((1 - 2 * (bit_count((j * 1000003 + d + 1) * 2654435761)
                            % 2)) * xm) AS BIGINT) AS y
  FROM rpex, unnest(range({out_dim})) AS s(j)
  GROUP BY vec_id, j
)"""


def rp_project_sql(out_dim: int = 16, in_dim: int = 64) -> str:
    """Mirrors ann_rp_project: micro-lift + pinned Rademacher sign sums
    (the sign formula of similarity._rp_sign_expr with DuckDB //,
    identical to Spark div on positive operands)."""
    ctes = _RP_PROJ_CTES.format(in_dim=in_dim, out_dim=out_dim, where="TRUE")
    return f"""
WITH
{ctes}
SELECT vec_id, j, y FROM rproj WHERE vec_id < 100
"""


def rp_topk_sql(k: int = 3, out_dim: int = 16, in_dim: int = 64) -> str:
    """Mirrors ann_rp_top3: exact BIGINT squared L2 in the projected
    space, (d2 ASC, neighbor ASC) ranking, self-matches excluded —
    no rounding anywhere (the d2 bound in_dim²·1e12·out_dim sits far
    inside 2^63 at unit-scale embeddings)."""
    ctes = _RP_PROJ_CTES.format(in_dim=in_dim, out_dim=out_dim, where="TRUE")
    return f"""
WITH
{ctes},
rpairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         CAST(SUM((a.y - b.y) * (a.y - b.y)) AS BIGINT) AS d2
  FROM rproj a JOIN rproj b ON a.j = b.j AND a.vec_id <> b.vec_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, d2, rank FROM (
  SELECT query_id, neighbor_id, d2,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY d2 ASC, neighbor_id ASC) AS rank
  FROM rpairs
) WHERE rank <= {k}
"""


def rp_distortion_sql(
    out_dim: int = 16, in_dim: int = 64, max_id: int = 300
) -> str:
    """Mirrors ann_rp_distortion: exact BIGINT pair distances in both
    spaces over the bounded pool, ratio = (1e6·d2_sketch) //
    (out_dim·d2_exact) in HUGEINT (1e6·d2s reaches ~1e23 — the Spark
    kernel runs the same division in Python bigints), nearest-rank
    p05/p50/p95 selection (value at a sorted position is well-defined
    under ties)."""
    ctes = _RP_PROJ_CTES.format(
        in_dim=in_dim, out_dim=out_dim, where=f"vec_id < {max_id}"
    )
    return f"""
WITH
{ctes},
de AS MATERIALIZED (
  SELECT a.vec_id AS qa, b.vec_id AS qb,
         CAST(SUM((a.xm - b.xm) * (a.xm - b.xm)) AS BIGINT) AS d2e
  FROM rpex a JOIN rpex b ON a.d = b.d AND a.vec_id < b.vec_id
  GROUP BY 1, 2
),
dsk AS MATERIALIZED (
  SELECT a.vec_id AS qa, b.vec_id AS qb,
         CAST(SUM((a.y - b.y) * (a.y - b.y)) AS BIGINT) AS d2s
  FROM rproj a JOIN rproj b ON a.j = b.j AND a.vec_id < b.vec_id
  GROUP BY 1, 2
),
r AS MATERIALIZED (
  SELECT CAST((1000000::HUGEINT * dsk.d2s)
              // ({out_dim} * de.d2e) AS BIGINT) AS ratio_micro
  FROM de JOIN dsk ON de.qa = dsk.qa AND de.qb = dsk.qb
  WHERE de.d2e > 0
),
z AS (SELECT COUNT(*) AS n_zero FROM de WHERE d2e = 0),
n AS (SELECT COUNT(*) AS n_pairs FROM r),
sel AS (
  SELECT ratio_micro, ROW_NUMBER() OVER (ORDER BY ratio_micro ASC) AS rn
  FROM r
)
SELECT
  MAX(CASE WHEN rn = 1 + (5 * (n_pairs - 1)) // 100
      THEN ratio_micro END) AS p05_micro,
  MAX(CASE WHEN rn = 1 + (50 * (n_pairs - 1)) // 100
      THEN ratio_micro END) AS p50_micro,
  MAX(CASE WHEN rn = 1 + (95 * (n_pairs - 1)) // 100
      THEN ratio_micro END) AS p95_micro,
  CAST(MAX(n_pairs) AS BIGINT) AS n_pairs,
  CAST(MAX(n_zero) AS BIGINT) AS n_zero
FROM sel, n, z
"""


def ppr_sql(iters: int = 3, damp: int = 850_000, region: int = 2) -> str:
    """Mirrors nations_trade_ppr: unrolled replay of the personalized
    recurrence — teleport (1e6−damp)//nS and dangling redistribution
    ((dang·damp//1e6)//nS) land on the SEED nations only; seeds start
    at 1e6//nS, everything else 0."""
    parts = [
        f"""
WITH e AS MATERIALIZED (
  SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS src,
                  CAST(c_nationkey AS BIGINT) AS dst
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
),
seeds AS MATERIALIZED (
  SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation
  WHERE n_regionkey = {region}
),
nodes AS MATERIALIZED (
  SELECT src AS node FROM e UNION SELECT dst FROM e
  UNION SELECT node FROM seeds
),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
r0 AS MATERIALIZED (
  SELECT node,
         CASE WHEN node IN (SELECT node FROM seeds)
              THEN 1000000 // (SELECT COUNT(*) FROM seeds)
              ELSE 0 END AS r
  FROM nodes
)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
d{t - 1} AS MATERIALIZED (
  SELECT COALESCE(SUM(r), 0) AS dang FROM r{t - 1}
  WHERE node NOT IN (SELECT src FROM deg)
),
r{t} AS MATERIALIZED (
  SELECT nd.node,
         CASE WHEN nd.node IN (SELECT node FROM seeds)
              THEN (1000000 - {damp}) // (SELECT COUNT(*) FROM seeds)
              ELSE 0 END
           + COALESCE(c.s, 0)
           + CASE WHEN nd.node IN (SELECT node FROM seeds)
                  THEN (((SELECT dang FROM d{t - 1}) * {damp}) // 1000000)
                       // (SELECT COUNT(*) FROM seeds)
                  ELSE 0 END AS r
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node,
           CAST(SUM(((r.r * {damp}) // 1000000) // o.deg) AS BIGINT) AS s
    FROM e JOIN deg o ON e.src = o.src JOIN r{t - 1} r ON r.node = e.src
    GROUP BY e.dst) c ON nd.node = c.node
)"""
        )
    parts.append(
        f"""
SELECT n_name, CAST(r AS BIGINT) AS rank_micro
FROM r{iters} JOIN nation ON node = n_nationkey
"""
    )
    return "".join(parts)


def robust_stats_sql(trim_milli: int = 100) -> str:
    """Mirrors events_robust_stats: per-type rank window, boundary
    order statistics, conditional trimmed sum, clamp-winsorized sum —
    all BIGINT, tie-invariant multisets."""
    return f"""
WITH c AS MATERIALIZED (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
  FROM events
),
rk AS MATERIALIZED (
  SELECT event_type, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x ASC) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM c
),
b AS MATERIALIZED (
  SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
         CAST(MAX((n * {trim_milli}) // 1000) AS BIGINT) AS k_trim,
         MAX(CASE WHEN rn = (n * {trim_milli}) // 1000 + 1 THEN x END) AS lo,
         MAX(CASE WHEN rn = n - (n * {trim_milli}) // 1000 THEN x END) AS hi,
         SUM(CASE WHEN rn > (n * {trim_milli}) // 1000
                   AND rn <= n - (n * {trim_milli}) // 1000
                  THEN x END) AS tsum
  FROM rk GROUP BY event_type
),
w AS (
  SELECT rk.event_type, SUM(GREATEST(LEAST(x, hi), lo)) AS wsum
  FROM rk JOIN b USING (event_type) GROUP BY rk.event_type
)
SELECT b.event_type, b.n, b.k_trim, b.lo, b.hi,
       CAST((1000000 * tsum) // (n - 2 * k_trim) AS BIGINT)
         AS trimmed_mean_micro,
       CAST((1000000 * wsum) // n AS BIGINT) AS winsor_mean_micro
FROM b JOIN w USING (event_type)
"""


def dsir_sql(n_buckets: int = 64, micro: int = 1_000_000, top_k: int = 15) -> str:
    """Mirrors pipeline.dsir_weights as driven by queries.pipeline_dsir:
    unigram + bigram feature strings (bigram = w1 || ' ' || w2 — token
    space is space-free, so the feature spaces are disjoint), the
    md5-portable bucket hash, Laplace +1 smoothed target/raw bucket
    distributions, per-bucket micro-nat floors of EACH ln separately,
    and exact BIGINT count*delta per-doc sums.  CTEs feeding multiple
    consumers are AS MATERIALIZED (the house DuckDB join-order trap).
    Target slice = source IN ('src0','src1','src2')."""
    return f"""
WITH d AS MATERIALIZED (
  SELECT doc_id,
         lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS ntext,
         source IN ('src0', 'src1', 'src2') AS tgt
  FROM documents
),
toks AS (SELECT doc_id, tgt, string_split(ntext, ' ') AS t FROM d),
uni AS (
  SELECT doc_id, tgt, u.term
  FROM (SELECT doc_id, tgt, t AS ts FROM toks), unnest(ts) AS u(term)
  WHERE u.term != ''
),
bg AS (
  SELECT doc_id, tgt, u.term FROM (
    SELECT doc_id, tgt,
           unnest(list_transform(range(len(t) - 1),
                  i -> t[i + 1] || ' ' || t[i + 2])) AS term
    FROM toks WHERE len(t) >= 2
  ) u(doc_id, tgt, term)
),
fh AS MATERIALIZED (
  SELECT doc_id, tgt,
         (('0x' || substr(md5(term), 1, 15))::BIGINT % 1000000007)
           % {n_buckets} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bg)
  GROUP BY doc_id, tgt, bucket
),
side AS MATERIALIZED (
  SELECT bucket,
         CAST(SUM(CASE WHEN tgt THEN cnt ELSE 0 END) AS BIGINT) AS ct,
         CAST(SUM(CASE WHEN NOT tgt THEN cnt ELSE 0 END) AS BIGINT) AS cr
  FROM fh GROUP BY bucket
),
tot AS MATERIALIZED (
  SELECT CAST(SUM(ct) AS BIGINT) AS tt, CAST(SUM(cr) AS BIGINT) AS tr
  FROM side
),
delta AS MATERIALIZED (
  SELECT bucket,
         CAST(
           FLOOR({micro} * LN(CAST(ct + 1 AS DOUBLE)
                              / CAST(tt + {n_buckets} AS DOUBLE)))
         - FLOOR({micro} * LN(CAST(cr + 1 AS DOUBLE)
                              / CAST(tr + {n_buckets} AS DOUBLE)))
         AS BIGINT) AS delta_micro
  FROM side, tot
)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_feats,
       CAST(SUM(cnt * delta_micro) AS BIGINT) AS w_micro
FROM fh JOIN delta USING (bucket)
WHERE NOT tgt
GROUP BY doc_id
ORDER BY w_micro DESC, doc_id
LIMIT {top_k}
"""
