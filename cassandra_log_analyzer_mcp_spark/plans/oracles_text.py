"""DuckDB oracle SQL for §2D text / dedup / similarity operators.

Generated from the same constants as the Spark operators
(functions/texts.py, operators/dedup.py, operators/similarity.py) so
thresholds, patterns, and hash recipes cannot drift between engines.
"""

from __future__ import annotations

from ..functions.texts import (
    BPE_REGEX,
    LANG_STOPWORDS,
    PUNCT_REGEX,
    TOKEN_REGEX,
    lang_pattern,
    quality_stop_pattern,
)
from ..operators.curation import (
    QUALITY_MIN,
    SAMPLE_DEFAULT_RATE,
    SAMPLE_RATES,
    SAMPLE_SALT,
    SPLIT_BOUNDS,
    SPLIT_LAST,
    SPLIT_SALT,
    TOKENS_MAX,
    TOKENS_MIN,
)
from ..operators.dedup import (
    BAND_MAX_OCCUPANCY,
    JACCARD_DEN,
    JACCARD_NUM,
    JACCARD_THRESHOLD,
    MINHASH_BANDS,
    MINHASH_K,
    MINHASH_VERIFY_MIN,
    SHINGLE_K,
    SIMHASH_BANDS,
    SIMHASH_BITS,
    SIMHASH_MAX_HAMMING,
)
from ..operators.similarity import (
    ANN_N_PLANES,
    ANN_N_QUERIES,
    ANN_TOP_K,
    EMBED_DEDUP_MIN_SIM,
    IVF_N_CELLS,
    IVF_NPROBE,
    IVF_TOP_K,
    KNN_N_QUERIES,
    KNN_TOP_K,
    lsh_planes,
)
from ..operators.textops import (
    FINGERPRINT_K,
    HIST_BUCKET_TOKENS,
    OOV_VOCAB_K,
    REPEAT_K,
    REPEAT_TOP_K,
    VOCAB_TOP_K,
)

TOKS = f"regexp_extract_all(text, '{TOKEN_REGEX}')"


def _shingle_cte(k: int) -> str:
    """sh(doc_id, s): distinct k-token shingles per document."""
    return f"""
toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(t) - {k - 1}, 0) + 1),
                  i -> array_to_string(t[i:i + {k - 1}], ' '))) AS s
    FROM toks) u
)"""


_VERIFY = """
arrs AS (SELECT doc_id, list(s) AS arr FROM sh GROUP BY doc_id),
verified AS (
  SELECT c.da, c.db,
         round(len(list_intersect(a.arr, b.arr))
               / (len(a.arr) + len(b.arr) - len(list_intersect(a.arr, b.arr))),
               4) AS jaccard
  FROM cand c
  JOIN arrs a ON a.doc_id = c.da
  JOIN arrs b ON b.doc_id = c.db
)"""


def text_oracles() -> dict[str, str]:
    o: dict[str, str] = {}

    o["mixture_temperature_weights"] = f"""
        WITH per AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(len({TOKS})) AS BIGINT) AS n_tokens,
                 CAST(floor(sqrt(count(*))) AS BIGINT) AS w
          FROM documents GROUP BY lang),
        tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tot_docs,
                       CAST(sum(w) AS BIGINT) AS tot_w FROM per)
        SELECT lang, n_docs, n_tokens,
               CAST(1000 * n_docs // tot_docs AS BIGINT)
                 AS share_permille,
               CAST(1000 * w // tot_w AS BIGINT)
                 AS temp_share_permille,
               CAST(1000 * w // tot_w - 1000 * n_docs // tot_docs
                    AS BIGINT) AS boost_permille
        FROM per, tot
    """

    from ..operators.textops import VOCAB_COVERAGE_SIZES as _VCS

    o["vocab_coverage_curve"] = f"""
        WITH counts AS (
          SELECT token, CAST(count(*) AS BIGINT) AS c
          FROM (SELECT unnest({TOKS}) AS token FROM documents) u
          GROUP BY token),
        ranked AS (
          SELECT c, row_number() OVER (ORDER BY c DESC, token) AS rk
          FROM counts),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS total_tokens,
                       CAST(count(*) AS BIGINT) AS vocab_size_full
                FROM counts),
        b AS (SELECT unnest({_VCS}) AS vocab_size)
        SELECT CAST(b.vocab_size AS INT) AS vocab_size,
               CAST(sum(r.c) AS BIGINT) AS covered_tokens,
               tot.total_tokens, tot.vocab_size_full,
               CAST(1000 * CAST(sum(r.c) AS BIGINT) // tot.total_tokens
                    AS BIGINT) AS coverage_permille
        FROM b JOIN ranked r ON r.rk <= b.vocab_size, tot
        GROUP BY b.vocab_size, tot.total_tokens, tot.vocab_size_full
    """

    from ..operators.textops import (
        SPANC_GROUP as _SG,
        SPANC_RATE_HEX as _SRH,
        SPANC_SEED as _SS,
    )

    o["augment_span_corruption"] = f"""
        WITH d AS (SELECT doc_id, {TOKS} AS t FROM documents),
        g AS (
          SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens, t,
                 unnest(range(0,
                   CAST(ceil(len(t) / {_SG}.0) AS BIGINT))) AS g
          FROM d WHERE len(t) > 0),
        p AS (
          SELECT doc_id, n_tokens, g,
                 array_to_string(
                   t[g * {_SG} + 1 : g * {_SG} + {_SG}], ' ') AS piece,
                 substr(md5('{_SS}:' || CAST(doc_id AS VARCHAR) || ':'
                            || CAST(g AS VARCHAR)), 1, 4)
                   < '{_SRH}' AS masked
          FROM g),
        m AS (
          SELECT doc_id, n_tokens, g, piece, masked,
                 CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END)
                      OVER (PARTITION BY doc_id ORDER BY g) AS INT)
                 - CASE WHEN masked THEN 1 ELSE 0 END AS sid
          FROM p)
        SELECT doc_id, n_tokens,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_masked_groups,
               string_agg(CASE WHEN masked
                               THEN '<extra_id_' || sid || '>'
                               ELSE piece END, ' ' ORDER BY g)
                 AS corrupted_text,
               coalesce(string_agg(
                 CASE WHEN masked
                      THEN '<extra_id_' || sid || '> ' || piece END,
                 ' ' ORDER BY g), '') AS targets_text
        FROM m GROUP BY doc_id, n_tokens
    """

    o["token_count"] = f"""
        SELECT doc_id,
               CAST(len({TOKS}) AS INT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '{BPE_REGEX}')) AS INT) AS n_bpe_tokens,
               CAST(length(text) AS INT) AS len_chars
        FROM documents
    """

    from ..operators.textops import (
        PII_EMAIL_REGEX,
        PII_IPV4_REGEX,
        PII_PHONE_REGEX,
    )

    # synthetic PII woven in with the same doc_id-keyed construction
    # as the Spark side; the scrubbed text must match byte-identical
    pii_text = (
        "text"
        " || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id"
        " || '@example.com' ELSE '' END"
        " || CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || (doc_id % 256)"
        " || '.0.' || (doc_id % 100) ELSE '' END"
        " || CASE WHEN doc_id % 7 = 0 THEN ' call 555-'"
        " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    )
    o["pii_scrub"] = f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '{PII_EMAIL_REGEX}'))
                    AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(t, '{PII_IPV4_REGEX}'))
                    AS BIGINT) AS n_ips,
               CAST(len(regexp_extract_all(t, '{PII_PHONE_REGEX}'))
                    AS BIGINT) AS n_phones,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(t, '{PII_EMAIL_REGEX}', '<EMAIL>', 'g'),
                   '{PII_IPV4_REGEX}', '<IP>', 'g'),
                 '{PII_PHONE_REGEX}', '<PHONE>', 'g') AS scrubbed
        FROM (SELECT doc_id, {pii_text} AS t FROM documents) p
    """

    # No rounding: identical IEEE computation graphs on both engines
    # (see operators/textops.py quality_score).
    o["quality_score"] = f"""
        SELECT doc_id,
               CAST(len_chars AS INT) AS len_chars,
               CAST(n_tokens AS INT) AS n_tokens,
               punct_ratio, stop_ratio, uniq_ratio,
               0.25 * stop_ratio + 0.25 * uniq_ratio
                 + 0.25 * (1 - punct_ratio) + 0.25 * length_term AS quality
        FROM (
          SELECT doc_id,
                 length(text) AS len_chars,
                 len({TOKS}) AS n_tokens,
                 len(regexp_extract_all(text, '{PUNCT_REGEX}')) / length(text) AS punct_ratio,
                 len(regexp_extract_all(text, '{quality_stop_pattern()}')) / len({TOKS}) AS stop_ratio,
                 len(list_distinct({TOKS})) / len({TOKS}) AS uniq_ratio,
                 least(len({TOKS}) / 100, 1.0) AS length_term
          FROM documents
        ) t
    """

    # augmentation: the identical seeded draw replayed per token
    from ..operators.textops import AUG_SEED

    o["augment_token_dropout"] = f"""
        WITH t AS (SELECT doc_id, {TOKS} AS tk FROM documents),
        kept AS (
          SELECT doc_id, len(tk) AS n_tokens,
                 list_filter(tk, (tok, i) ->
                   substr(md5('{AUG_SEED}:' || doc_id || ':' || (i - 1)
                              || ':' || tok), 1, 1) != '0') AS ktoks
          FROM t
        )
        SELECT doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(len(ktoks) AS BIGINT) AS kept,
               CAST(n_tokens - len(ktoks) AS BIGINT) AS dropped,
               md5(array_to_string(ktoks, ' ')) AS aug_hash
        FROM kept
    """

    # phrase search: adjacency recounted straight from the documents
    # with the identical tokenizer — the index never enters the
    # oracle; the position-set count handles overlapping occurrences
    from ..operators.textops import SEARCH_PHRASES

    _phrase_parts = " UNION ALL ".join(
        f"""
        SELECT '{w1} {w2}' AS phrase, doc_id,
               CAST(len(list_filter(range(1, len(tk)),
                    i -> tk[i] = '{w1}' AND tk[i+1] = '{w2}'))
                 AS BIGINT) AS n_matches
        FROM t"""
        for w1, w2 in SEARCH_PHRASES
    )
    o["phrase_search_positional"] = f"""
        WITH t AS (SELECT doc_id, {TOKS} AS tk FROM documents)
        SELECT * FROM ({_phrase_parts}) u WHERE n_matches > 0
    """

    # skyline: the O(n²) NOT EXISTS dominance formulation — an
    # INDEPENDENT derivation of the frontier the Spark side reaches
    # via banded running minima (n_tokens is INT here vs the graded
    # BIGINT, so re-cast)
    o["doc_quality_skyline"] = f"""
        WITH f AS ({o['quality_score']})
        SELECT a.doc_id, CAST(a.n_tokens AS BIGINT) AS n_tokens,
               a.quality
        FROM f a
        WHERE NOT EXISTS (
          SELECT 1 FROM f b
          WHERE b.quality >= a.quality AND b.n_tokens <= a.n_tokens
            AND (b.quality > a.quality OR b.n_tokens < a.n_tokens)
        )
    """

    langs = list(LANG_STOPWORDS)
    score_cols = ",\n".join(
        f"CAST(len(regexp_extract_all(text, '{lang_pattern(lg)}')) AS INT) AS s_{lg}"
        for lg in langs
    )
    chain = []
    for i, lg in enumerate(langs):
        conds = [f"s_{lg} >= s_{other}" for other in langs[i + 1 :]]
        chain.append(
            f"WHEN {' AND '.join(conds)} THEN '{lg}'" if conds else f"ELSE '{lg}'"
        )
    pred_case = "CASE " + " ".join(chain) + " END"
    # mixture-planning rollup: docs/tokens per PREDICTED language,
    # integer-permille corpus share, one int/int mean division
    # (round 10 — VERDICT r9 era training-pipeline reporting verbs)
    o["corpus_token_budget_by_lang"] = f"""
        WITH s AS (
          SELECT {pred_case} AS pred_lang, n_tok
          FROM (SELECT len({TOKS}) AS n_tok, {score_cols}
                FROM documents) sc
        ),
        a AS (
          SELECT pred_lang, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_tok) AS BIGINT) AS n_tokens
          FROM s GROUP BY pred_lang
        )
        SELECT pred_lang, n_docs, n_tokens,
               CAST((1000 * n_tokens) //
                    (SELECT sum(n_tokens) FROM a) AS BIGINT)
                 AS share_permille,
               n_tokens / CAST(n_docs AS DOUBLE) AS mean_doc_tokens
        FROM a
    """

    # predicted-language x quality-bucket crosstab; cutpoints are the
    # SAME decimal literals the Spark operator parses (textops
    # QUALITY_BUCKET_LO/HI), the quality expression is quality_score's
    from ..operators.textops import (
        QUALITY_BUCKET_HI,
        QUALITY_BUCKET_LO,
    )

    quality_expr = (
        f"0.25 * (len(regexp_extract_all(text,"
        f" '{quality_stop_pattern()}')) / len({TOKS}))"
        f" + 0.25 * (len(list_distinct({TOKS})) / len({TOKS}))"
        f" + 0.25 * (1 - len(regexp_extract_all(text,"
        f" '{PUNCT_REGEX}')) / length(text))"
        f" + 0.25 * least(len({TOKS}) / 100, 1.0)"
    )
    o["quality_lang_crosstab"] = f"""
        WITH s AS (
          SELECT {pred_case} AS pred_lang,
                 CASE WHEN quality < CAST('{QUALITY_BUCKET_LO}' AS DOUBLE)
                        THEN 'low'
                      WHEN quality < CAST('{QUALITY_BUCKET_HI}' AS DOUBLE)
                        THEN 'mid'
                      ELSE 'high' END AS bucket
          FROM (SELECT {quality_expr} AS quality, {score_cols}
                FROM documents) sc
        ),
        a AS (
          SELECT pred_lang, bucket, CAST(count(*) AS BIGINT) AS n_docs
          FROM s GROUP BY pred_lang, bucket
        )
        SELECT pred_lang, bucket, n_docs,
               CAST((1000 * n_docs) //
                    sum(n_docs) OVER (PARTITION BY pred_lang)
                 AS BIGINT) AS share_of_lang_permille
        FROM a
    """

    o["lang_id"] = f"""
        SELECT doc_id, lang, {', '.join(f's_{lg}' for lg in langs)},
               {pred_case} AS pred_lang,
               ({pred_case} = lang) AS correct
        FROM (SELECT doc_id, lang, text, {score_cols} FROM documents) t
    """

    # composed from lang_id's prediction CASE so the matrix cannot
    # drift from the classifier it evaluates
    o["lang_confusion"] = f"""
        SELECT lang, pred_lang, n,
               CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS n_truth,
               n / CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT)
                 AS recall
        FROM (
          SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
          FROM (
            SELECT lang, {pred_case} AS pred_lang
            FROM (SELECT lang, {score_cols} FROM documents) s
          ) p
          GROUP BY lang, pred_lang
        ) m
    """

    o["doc_fingerprint"] = f"""
        SELECT doc_id,
               CASE WHEN len(t) >= {FINGERPRINT_K}
                    THEN list_min(list_transform(
                         range(1, greatest(len(t) - {FINGERPRINT_K - 1}, 0) + 1),
                         i -> md5(array_to_string(t[i:i + {FINGERPRINT_K - 1}], ' '))))
                    ELSE md5(text) END AS fingerprint,
               CAST(greatest(len(t) - {FINGERPRINT_K - 1}, 0) AS INT) AS n_shingles
        FROM (SELECT doc_id, text, {TOKS} AS t FROM documents) u
    """

    o["doc_rarity"] = f"""
        WITH tok AS (
          SELECT DISTINCT doc_id, unnest({TOKS}) AS token FROM documents
        ),
        df_tbl AS (
          SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
          FROM tok GROUP BY token
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_distinct_tokens,
               round(avg(df), 4) AS mean_df,
               round(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) / count(*), 4)
                 AS hapax_ratio
        FROM tok JOIN df_tbl USING (token)
        GROUP BY doc_id
    """

    # bigram surprisal: bit lengths stand in for floor(log2) — pure
    # string ops, no libm; mean is one exact int/int division
    o["doc_surprisal"] = f"""
        WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
        g AS (
          SELECT doc_id, unnest(list_transform(
                   range(1, greatest(len(t) - 1, 0) + 1),
                   i -> array_to_string(t[i:i + 1], ' '))) AS gram
          FROM toks
        ),
        counts AS (
          SELECT gram, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY gram
        ),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM counts)
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum((length(bin(total)) - 1)
                        - (length(bin(c)) - 1)) AS BIGINT)
                 AS surprisal_bits,
               round(sum((length(bin(total)) - 1)
                         - (length(bin(c)) - 1)) / count(*), 4)
                 AS mean_bits
        FROM g JOIN counts USING (gram), tot
        GROUP BY doc_id
    """

    o["vocab_top_tokens"] = f"""
        WITH tok AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
        counts AS (
          SELECT token,
                 CAST(count(*) AS BIGINT) AS n_occurrences,
                 CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM tok GROUP BY token
        )
        SELECT token, n_occurrences, n_docs,
               CAST(row_number() OVER (ORDER BY n_occurrences DESC, token)
                    AS INT) AS rk
        FROM counts ORDER BY n_occurrences DESC, token LIMIT {VOCAB_TOP_K}
    """

    # per-doc OOV rate vs the corpus' own top-K vocabulary — the
    # LIMIT boundary tie-broken (n DESC, token) on both engines
    o["doc_oov_rate"] = f"""
        WITH tok AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
        counts AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
        top AS (SELECT token FROM counts
                ORDER BY n DESC, token LIMIT {OOV_VOCAB_K})
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN token IN (SELECT token FROM top)
                        THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
               CAST(1000 * sum(CASE WHEN token IN (SELECT token FROM top)
                               THEN 0 ELSE 1 END) // count(*) AS BIGINT)
                 AS oov_permille
        FROM tok GROUP BY doc_id
    """

    # Zipf slope over the vocabulary head: integer bit-length x/y,
    # Cramer integer moments, one IEEE division rounded at 4dp
    from ..operators.textops import ZIPF_TOP_K

    o["doc_zipf_fit"] = f"""
        WITH tok AS (SELECT lang, unnest({TOKS}) AS token
                     FROM documents),
        counts AS (
          SELECT lang, token, CAST(count(*) AS BIGINT) AS c
          FROM tok GROUP BY lang, token
        ),
        tiers AS (
          SELECT lang, token, c FROM counts
          UNION ALL
          SELECT '*ALL*' AS lang, token,
                 CAST(sum(c) AS BIGINT) AS c
          FROM counts GROUP BY token
        ),
        head AS (
          SELECT lang,
                 CAST(length(bin(rk)) - 1 AS BIGINT) AS x,
                 CAST(length(bin(c)) - 1 AS BIGINT) AS y
          FROM (
            SELECT lang, c,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY c DESC, token) AS rk
            FROM tiers
          ) r WHERE rk <= {ZIPF_TOP_K}
        ),
        agg AS (
          SELECT lang,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx
          FROM head GROUP BY lang
        )
        SELECT lang,
               n AS n_points,
               CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
               CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
               CASE WHEN n * sxx - sx * sx <> 0 THEN
                 round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
               END AS zipf_slope
        FROM agg
    """

    # positional (non-distinct) grams: n_occurrences counts true
    # repetitions; the HAVING keeps only cross-document repeats.
    o["repeated_ngrams"] = f"""
        WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
        g AS (
          SELECT doc_id,
                 unnest(list_transform(
                   range(1, greatest(len(t) - {REPEAT_K - 1}, 0) + 1),
                   i -> array_to_string(t[i:i + {REPEAT_K - 1}], ' ')))
                   AS gram
          FROM toks
        )
        SELECT gram,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_occurrences,
               min(doc_id) AS example_doc
        FROM g
        GROUP BY gram
        HAVING count(DISTINCT doc_id) > 1
        ORDER BY n_occurrences DESC, n_docs DESC, gram
        LIMIT {REPEAT_TOP_K}
    """

    # per-doc coverage by cross-document REPEAT_K-spans; positions are
    # 1-based here vs 0-based posexplode on the Spark side — only the
    # covered-position CARDINALITY is compared, which is offset-free
    o["repeated_span_coverage"] = f"""
        WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
        g AS (
          SELECT doc_id, unnest(gr) AS gram,
                 unnest(range(1, len(gr) + 1)) AS pos
          FROM (
            SELECT doc_id,
                   list_transform(
                     range(1, greatest(len(t) - {REPEAT_K - 1}, 0) + 1),
                     i -> array_to_string(t[i:i + {REPEAT_K - 1}], ' '))
                     AS gr
            FROM toks) x
        ),
        dup AS (
          SELECT gram FROM g GROUP BY gram
          HAVING count(DISTINCT doc_id) > 1
        ),
        hits AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
        cov AS (
          SELECT DISTINCT doc_id, tp FROM (
            SELECT doc_id, unnest(range(pos, pos + {REPEAT_K})) AS tp
            FROM hits) u
        ),
        cnt AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS covered_tokens
          FROM cov GROUP BY doc_id
        )
        SELECT b.doc_id, b.n_tokens,
               COALESCE(c.covered_tokens, 0) AS covered_tokens,
               CASE WHEN b.n_tokens > 0
                    THEN COALESCE(c.covered_tokens, 0) / b.n_tokens
                    ELSE 0.0 END AS coverage
        FROM (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens
              FROM toks) b
        LEFT JOIN cnt c USING (doc_id)
    """

    from ..operators.textops import CHUNK_TOKENS as _CK

    # aligned-chunk digests, cross-doc set, per-doc dup fraction —
    # list slicing is 1-based inclusive on both engines and both
    # clamp at the array end (trailing partial chunk kept)
    o["chunk_dedup"] = f"""
        WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
        c AS (
          SELECT doc_id, unnest(list_transform(
                   range(0, CAST(ceil(len(t) / {_CK}.0) AS INT)),
                   i -> md5(array_to_string(
                          t[i * {_CK} + 1 : i * {_CK} + {_CK}], ' '))))
                 AS h
          FROM toks WHERE len(t) > 0
        ),
        cross_c AS (
          SELECT h FROM c GROUP BY h HAVING count(DISTINCT doc_id) > 1
        ),
        dup AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_chunks
          FROM c JOIN cross_c USING (h) GROUP BY doc_id
        )
        SELECT b.doc_id, b.n_chunks,
               COALESCE(d.n_dup_chunks, 0) AS n_dup_chunks,
               COALESCE(d.n_dup_chunks, 0) / b.n_chunks
                 AS dup_chunk_frac
        FROM (SELECT doc_id,
                     CAST(ceil(len(t) / {_CK}.0) AS BIGINT) AS n_chunks
              FROM toks) b
        LEFT JOIN dup d USING (doc_id)
    """

    # keep-first survivorship is one row_number per digest ordered by
    # (doc_id, idx); the rewrite joins surviving chunk TEXT back via
    # array slicing of the original tokens — chunks glue with single
    # spaces exactly like the Spark flatten+array_join rebuild
    o["dedup_chunks_rewrite"] = f"""
        WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
        c AS (
          SELECT doc_id, i AS idx,
                 md5(array_to_string(
                       t[i * {_CK} + 1 : i * {_CK} + {_CK}], ' ')) AS h
          FROM (SELECT doc_id, t,
                       unnest(range(0, CAST(ceil(len(t) / {_CK}.0)
                                            AS INT))) AS i
                FROM toks WHERE len(t) > 0)
        ),
        kept AS (
          SELECT doc_id, idx FROM (
            SELECT doc_id, idx,
                   row_number() OVER (PARTITION BY h
                                      ORDER BY doc_id, idx) AS rn
            FROM c) WHERE rn = 1
        ),
        rebuilt AS (
          SELECT k.doc_id,
                 CAST(count(*) AS BIGINT) AS n_kept,
                 string_agg(
                   array_to_string(
                     t[k.idx * {_CK} + 1 : k.idx * {_CK} + {_CK}],
                     ' '),
                   ' ' ORDER BY k.idx) AS clean_text
          FROM kept k JOIN toks USING (doc_id)
          GROUP BY k.doc_id
        )
        SELECT b.doc_id,
               CAST(ceil(len(b.t) / {_CK}.0) AS BIGINT) AS n_chunks,
               COALESCE(r.n_kept, 0) AS n_kept,
               COALESCE(r.clean_text, '') AS clean_text
        FROM toks b LEFT JOIN rebuilt r USING (doc_id)
    """

    # merged maximal spans: same gram/dup/hits CTEs as coverage (pos
    # shifted to 0-based to align with posexplode), then the identical
    # gaps-and-islands windows — running-max-end decides merges,
    # running-sum numbers the islands
    o["repeated_spans_merged"] = f"""
        WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
        g AS (
          SELECT doc_id, unnest(gr) AS gram,
                 unnest(range(1, len(gr) + 1)) AS pos
          FROM (
            SELECT doc_id,
                   list_transform(
                     range(1, greatest(len(t) - {REPEAT_K - 1}, 0) + 1),
                     i -> array_to_string(t[i:i + {REPEAT_K - 1}], ' '))
                     AS gr
            FROM toks) x
        ),
        dup AS (
          SELECT gram FROM g GROUP BY gram
          HAVING count(DISTINCT doc_id) > 1
        ),
        hits AS (SELECT g.doc_id, g.pos - 1 AS pos FROM g JOIN dup USING (gram)),
        m AS (
          SELECT doc_id, pos,
                 max(pos + {REPEAT_K}) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS run_end
          FROM hits
        ),
        s AS (
          SELECT doc_id, pos,
                 sum(CASE WHEN run_end IS NULL OR pos > run_end
                          THEN 1 ELSE 0 END) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS span_id
          FROM m
        )
        SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
               CAST(min(pos) AS BIGINT) AS span_start,
               CAST(max(pos) + {REPEAT_K} AS BIGINT) AS span_end_excl,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(max(pos) + {REPEAT_K} - min(pos) AS BIGINT)
                 AS span_tokens
        FROM s GROUP BY doc_id, span_id
    """

    # variable-K maximal repeats (round 6): three gram widths UNION'd
    # into one positional hit stream (duplication judged per width),
    # then the identical gaps-and-islands pass with variable interval
    # ends pos+k; per-width support counts + the max certified width
    from ..operators.textops import MULTIK_WIDTHS

    _mk_gram_legs = "\n          UNION ALL\n".join(
        f"""
          SELECT doc_id, unnest(gr) AS gram,
                 unnest(range(1, len(gr) + 1)) AS pos,
                 {k} AS k
          FROM (
            SELECT doc_id,
                   list_transform(
                     range(1, greatest(len(t) - {k - 1}, 0) + 1),
                     i -> array_to_string(t[i:i + {k - 1}], ' '))
                     AS gr
            FROM toks) x{k}"""
        for k in MULTIK_WIDTHS
    )
    _mk_width_counts = ",\n               ".join(
        f"CAST(sum(CASE WHEN k = {k} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_grams_k{k}"
        for k in MULTIK_WIDTHS
    )
    o["repeated_spans_multik"] = f"""
        WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
        g AS (
          {_mk_gram_legs}
        ),
        dup AS (
          SELECT gram, k FROM g GROUP BY gram, k
          HAVING count(DISTINCT doc_id) > 1
        ),
        hits AS (
          SELECT g.doc_id, g.pos - 1 AS pos, g.k
          FROM g JOIN dup USING (gram, k)
        ),
        m AS (
          SELECT doc_id, pos, k,
                 max(pos + k) OVER (
                   PARTITION BY doc_id ORDER BY pos, k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS run_end
          FROM hits
        ),
        s AS (
          SELECT doc_id, pos, k,
                 sum(CASE WHEN run_end IS NULL OR pos > run_end
                          THEN 1 ELSE 0 END) OVER (
                   PARTITION BY doc_id ORDER BY pos, k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS span_id
          FROM m
        )
        SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
               CAST(min(pos) AS BIGINT) AS span_start,
               CAST(max(pos + k) AS BIGINT) AS span_end_excl,
               CAST(max(pos + k) - min(pos) AS BIGINT) AS span_tokens,
               {_mk_width_counts},
               CAST(max(k) AS BIGINT) AS max_k_certified
        FROM s GROUP BY doc_id, span_id
    """

    # the drop policy applied: certified spans (max width >= 2K) are
    # removed positionally and the text rebuilt from surviving tokens
    # — covered positions via unnest(range), anti-join, ordered
    # string_agg (plain SQL, independent of the Spark array lambdas)
    from ..operators.textops import SPAN_DROP_MIN_K

    _mk_spans_body = o["repeated_spans_multik"].strip()
    assert _mk_spans_body.startswith("WITH ")
    o["dedup_spans_rewrite"] = f"""
        WITH mk AS ({_mk_spans_body}),
        certified AS (
          SELECT doc_id, span_start, span_end_excl, span_tokens
          FROM mk WHERE max_k_certified >= {SPAN_DROP_MIN_K}
        ),
        toks2 AS (SELECT doc_id, {TOKS} AS t FROM documents),
        pos AS (
          SELECT doc_id, unnest(t) AS tok,
                 unnest(range(1, len(t) + 1)) AS p
          FROM toks2
        ),
        cov AS (
          SELECT doc_id, unnest(range(span_start, span_end_excl)) AS tp
          FROM certified
        ),
        kept AS (
          SELECT pos.doc_id, pos.p, pos.tok
          FROM pos LEFT JOIN cov
            ON pos.doc_id = cov.doc_id AND pos.p - 1 = cov.tp
          WHERE cov.tp IS NULL
        ),
        rebuilt AS (
          SELECT doc_id,
                 string_agg(tok, ' ' ORDER BY p) AS clean_text
          FROM kept GROUP BY doc_id
        ),
        dropped AS (
          SELECT doc_id, CAST(sum(span_tokens) AS BIGINT) AS n_dropped
          FROM certified GROUP BY doc_id
        )
        SELECT b.doc_id,
               CAST(len(b.t) AS BIGINT) AS n_tokens,
               COALESCE(d.n_dropped, 0) AS n_dropped,
               COALESCE(r.clean_text, '') AS clean_text
        FROM toks2 b
        LEFT JOIN dropped d USING (doc_id)
        LEFT JOIN rebuilt r USING (doc_id)
    """

    from ..operators.multimodal import FAKE_FPS_MS, MAX_FRAMES, MIN_DIM

    # the Arrow frame-sampling fan-out hash-checked per FRAME: the
    # stub slices payload bytes deterministically (ASCII corpus, so
    # byte slices == char slices) and every slice md5 recomputes in
    # SQL; all chunks are exactly `step` bytes because the k-th slice
    # ends at (k+1)*step <= n
    o["multimodal_frames_check"] = f"""
        WITH m AS (
          SELECT doc_id, text, length(text) AS n,
                 CAST(doc_id % 640 + 32 AS INT) AS width,
                 CAST(doc_id % 480 + 24 AS INT) AS height
          FROM documents
        ),
        f AS (
          SELECT doc_id, text, width, height,
                 least({MAX_FRAMES}, greatest(1, n // 64)) AS n_frames,
                 n // least({MAX_FRAMES}, greatest(1, n // 64)) AS step
          FROM m
        ),
        e AS (
          SELECT doc_id, text, width, height, step,
                 unnest(range(0, n_frames)) AS k
          FROM f
        )
        SELECT doc_id, CAST(k AS INT) AS frame_idx,
               CAST(k * {FAKE_FPS_MS} AS BIGINT) AS ts_ms,
               CAST(greatest({MIN_DIM}, width // 2) AS INT) AS out_width,
               CAST(greatest({MIN_DIM}, height // 2) AS INT) AS out_height,
               CAST(step AS BIGINT) AS frame_bytes,
               md5(substr(text, CAST(k * step + 1 AS INT),
                          CAST(step AS INT))) AS frame_hash
        FROM e
    """

    # the Arrow mapInPandas decode stage hash-checked: n_bytes via
    # octet_length (UTF-8-correct), mean_byte via per-char codepoint
    # sums (== byte sums for the ASCII corpus; a non-ASCII drop
    # mismatches loudly), metadata dims from the doc_id formulas in
    # multimodal.with_media_columns
    o["multimodal_decode_check"] = """
        SELECT doc_id, source,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(list_sum(list_transform(
                      range(1, length(text) + 1),
                      i -> ascii(text[i]))) AS BIGINT)
                 / CAST(length(text) AS BIGINT) AS mean_byte,
               CAST(doc_id % 640 + 32 AS INT) AS width,
               CAST(doc_id % 480 + 24 AS INT) AS height
        FROM documents
    """

    # the PCM kernel recomputed sample-by-sample from the same md5
    # hex arithmetic (4 hex digits → big-endian int16, two's
    # complement), no binary types needed SQL-side; one md5 block per
    # window so win_id == chunk index
    # aHash rebuilt pixel-by-pixel from the same md5 hex arithmetic:
    # group base image + fixed perturbed pixels, integer mean
    # threshold (64·v > Σv), bit i of the hash = grid pixel (63−i),
    # HUGEINT packing signed back to int64 two's complement to match
    # numpy's .view('>i8'); bands recomputed from the UNSIGNED h so
    # the shift semantics match shiftrightunsigned.
    from ..operators.multimodal import (
        PHASH_BAND_BITS,
        PHASH_BANDS,
        PHASH_GROUP,
        PHASH_MAX_HAMMING,
        PHASH_PERTURB,
        PHASH_PIXELS,
    )

    # count-min sketch SIMULATED in SQL: identical md5 row keys,
    # mod-W cells, and min-over-rows estimate — the oracle rebuilds
    # the exact counter table, so grading covers the sketch's
    # collision arithmetic, not just the true counts.
    from ..operators.textops import CMS_D, CMS_W

    cms_cell = (
        "CAST('0x' || substr(md5(token || ':c' || CAST(r AS VARCHAR)),"
        f" 1, 8) AS BIGINT) % {CMS_W}"
    )
    o["token_counts_cms"] = f"""
        WITH tok AS (
          SELECT unnest({TOKS}) AS token FROM documents
        ),
        rr AS (SELECT unnest(range(0, {CMS_D})) AS r),
        cells AS (
          SELECT r, {cms_cell} AS cell, count(*) AS c
          FROM tok CROSS JOIN rr GROUP BY 1, 2
        ),
        cnt AS (SELECT token, count(*) AS n_true FROM tok GROUP BY token),
        probes AS (
          SELECT token, n_true, r, {cms_cell} AS cell
          FROM cnt CROSS JOIN rr
        )
        SELECT token,
               CAST(n_true AS BIGINT) AS n_true,
               CAST(min(c) AS BIGINT) AS n_est,
               CAST(min(c) - n_true AS BIGINT) AS inflation
        FROM probes JOIN cells USING (r, cell)
        GROUP BY token, n_true
    """

    hexd = "strpos('0123456789abcdef', substr(hx, {i}, 1)) - 1"
    p_list = ", ".join(str(p) for p in PHASH_PERTURB)
    p_off = " ".join(
        f"WHEN {p} THEN {2 * j + 1}" for j, p in enumerate(PHASH_PERTURB)
    )
    ph_mask = (1 << PHASH_BAND_BITS) - 1
    ph_bands = ", ".join(
        f"((h >> {b * PHASH_BAND_BITS}) & {ph_mask})"
        f" + {b * (1 << PHASH_BAND_BITS)}"
        for b in range(PHASH_BANDS)
    )
    o["multimodal_phash_dedup"] = f"""
        WITH px AS (
          SELECT doc_id, unnest(range(0, {PHASH_PIXELS})) AS i
          FROM documents
        ),
        hx2 AS (
          SELECT doc_id, i,
                 CASE WHEN i IN ({p_list}) THEN
                   substr(md5(CAST(doc_id AS VARCHAR) || ':px'),
                          CASE i {p_off} END, 2)
                 ELSE
                   substr(md5(CAST(doc_id // {PHASH_GROUP} AS VARCHAR)
                              || ':i' || CAST(i // 16 AS VARCHAR)),
                          CAST((i % 16) * 2 + 1 AS INT), 2)
                 END AS hx
          FROM px
        ),
        vals AS (
          SELECT doc_id, i,
                 ({hexd.format(i=1)}) * 16 + ({hexd.format(i=2)}) AS v
          FROM hx2
        ),
        bits AS (
          SELECT doc_id, i,
                 CASE WHEN v * {PHASH_PIXELS}
                           > sum(v) OVER (PARTITION BY doc_id)
                      THEN 1 ELSE 0 END AS b
          FROM vals
        ),
        hashed AS (
          SELECT doc_id,
                 sum(CASE WHEN b = 1
                     THEN CAST(1 AS HUGEINT) << (63 - i)
                     ELSE CAST(0 AS HUGEINT) END) AS h
          FROM bits GROUP BY doc_id
        ),
        signed AS (
          SELECT doc_id, h,
                 CAST(CASE WHEN h >= CAST('9223372036854775808' AS HUGEINT)
                      THEN h - CAST('18446744073709551616' AS HUGEINT)
                      ELSE h END AS BIGINT) AS ph
          FROM hashed
        ),
        buckets AS (
          SELECT doc_id, ph, unnest([{ph_bands}]) AS band FROM signed
        )
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
               CAST(bit_count(xor(a.ph, b.ph)) AS INT) AS hamming
        FROM buckets a JOIN buckets b USING (band)
        WHERE a.doc_id < b.doc_id
          AND bit_count(xor(a.ph, b.ph)) <= {PHASH_MAX_HAMMING}
    """

    # image histogram: identical px/hx2/vals pixel reconstruction as
    # the phash oracle, then a per-doc GROUP BY over v>>6 bins — the
    # Arrow kernel's exact integers
    o["multimodal_image_histogram"] = f"""
        WITH px AS (
          SELECT doc_id, unnest(range(0, {PHASH_PIXELS})) AS i
          FROM documents
        ),
        hx2 AS (
          SELECT doc_id, i,
                 CASE WHEN i IN ({p_list}) THEN
                   substr(md5(CAST(doc_id AS VARCHAR) || ':px'),
                          CASE i {p_off} END, 2)
                 ELSE
                   substr(md5(CAST(doc_id // {PHASH_GROUP} AS VARCHAR)
                              || ':i' || CAST(i // 16 AS VARCHAR)),
                          CAST((i % 16) * 2 + 1 AS INT), 2)
                 END AS hx
          FROM px
        ),
        vals AS (
          SELECT doc_id, i,
                 ({hexd.format(i=1)}) * 16 + ({hexd.format(i=2)}) AS v
          FROM hx2
        )
        SELECT doc_id,
               CAST(sum(CASE WHEN v // 64 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b0,
               CAST(sum(CASE WHEN v // 64 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b1,
               CAST(sum(CASE WHEN v // 64 = 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b2,
               CAST(sum(CASE WHEN v // 64 = 3 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b3,
               CAST(sum(v) AS BIGINT) AS px_sum,
               CAST(min(v) AS BIGINT) AS px_min,
               CAST(max(v) AS BIGINT) AS px_max
        FROM vals GROUP BY doc_id
    """

    # scene cuts rebuilt byte-by-byte: per-shot base + per-frame
    # perturbed bytes from the same md5 hex arithmetic, inter-frame
    # L1 deltas re-derived in SQL (delta labeled with the LATER
    # frame, matching the kernel's diff+argmax+1 convention)
    from ..operators.multimodal import (
        SC_BYTES,
        SC_FRAMES,
        SC_PERTURB,
        SC_SHOT,
        SC_THRESH,
    )

    sc_hexd = "strpos('0123456789abcdef', substr(hx, {i}, 1)) - 1"
    sc_p_list = ", ".join(str(p) for p in SC_PERTURB)
    sc_p_off = " ".join(
        f"WHEN {p} THEN {2 * j + 1}" for j, p in enumerate(SC_PERTURB)
    )
    o["multimodal_scene_cuts"] = f"""
        WITH fb AS (
          SELECT doc_id, f, i,
                 CASE WHEN i IN ({sc_p_list}) THEN
                   substr(md5(CAST(doc_id AS VARCHAR) || ':f'
                              || CAST(f AS VARCHAR)),
                          CASE i {sc_p_off} END, 2)
                 ELSE
                   substr(md5(CAST(doc_id AS VARCHAR) || ':s'
                              || CAST(f // {SC_SHOT} AS VARCHAR)),
                          CAST(i * 2 + 1 AS INT), 2)
                 END AS hx
          FROM documents,
               (SELECT unnest(range(0, {SC_FRAMES})) AS f) tf,
               (SELECT unnest(range(0, {SC_BYTES})) AS i) ti
        ),
        vals AS (
          SELECT doc_id, f, i,
                 ({sc_hexd.format(i=1)}) * 16 + ({sc_hexd.format(i=2)})
                   AS v
          FROM fb
        ),
        deltas AS (
          SELECT a.doc_id, a.f, sum(abs(a.v - b.v)) AS d
          FROM vals a
          JOIN vals b ON b.doc_id = a.doc_id AND b.i = a.i
                     AND b.f = a.f - 1
          WHERE a.f >= 1 GROUP BY 1, 2
        )
        SELECT doc_id,
               CAST(sum(CASE WHEN d > {SC_THRESH} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_cuts,
               CAST(coalesce(min(CASE WHEN d > {SC_THRESH} THEN f END),
                             -1) AS BIGINT) AS first_cut_frame,
               CAST(max(d) AS BIGINT) AS max_delta
        FROM deltas GROUP BY doc_id
    """

    from ..operators.multimodal import AUDIO_CHUNKS, AUDIO_WIN

    hexd = "strpos('0123456789abcdef', substr(hx, {i}, 1)) - 1"
    # AV-sync: video bytes rebuilt as in scene_cuts; audio bytes are
    # the SAME frame bytes re-timed by the planted per-doc lag (pad
    # md5 off either end); the centered cross-correlation sweep is
    # replayed per candidate lag in raw-moment integer form
    from ..operators.multimodal import AV_LAGS

    _av_half = AV_LAGS // 2
    _av_lag_list = ", ".join(
        str(l) for l in range(-_av_half, _av_half + 1)
    )
    _vbyte_src = f"""CASE WHEN i IN ({sc_p_list}) THEN
                   substr(md5(CAST(doc_id AS VARCHAR) || ':f'
                              || CAST(src AS VARCHAR)),
                          CASE i {sc_p_off} END, 2)
                 ELSE
                   substr(md5(CAST(doc_id AS VARCHAR) || ':s'
                              || CAST(src // {SC_SHOT} AS VARCHAR)),
                          CAST(i * 2 + 1 AS INT), 2)
                 END"""
    o["multimodal_av_sync"] = f"""
        WITH grid AS (
          SELECT doc_id, g, i,
                 g - (doc_id % {AV_LAGS} - {_av_half}) AS src
          FROM documents,
               (SELECT unnest(range(0, {SC_FRAMES})) AS g) tg,
               (SELECT unnest(range(0, {SC_BYTES})) AS i) ti
        ),
        ahx AS (
          SELECT doc_id, g, i,
                 CASE WHEN src BETWEEN 0 AND {SC_FRAMES - 1} THEN
                   {_vbyte_src}
                 ELSE
                   substr(md5(CAST(doc_id AS VARCHAR) || ':pad'
                              || CAST(g AS VARCHAR)),
                          CAST(i * 2 + 1 AS INT), 2)
                 END AS hx
          FROM grid
        ),
        avals AS (
          SELECT doc_id, g, i,
                 ({sc_hexd.format(i=1)}) * 16 + ({sc_hexd.format(i=2)})
                   AS v
          FROM ahx
        ),
        vhx AS (
          SELECT doc_id, g AS f, i,
                 CASE WHEN i IN ({sc_p_list}) THEN
                   substr(md5(CAST(doc_id AS VARCHAR) || ':f'
                              || CAST(g AS VARCHAR)),
                          CASE i {sc_p_off} END, 2)
                 ELSE
                   substr(md5(CAST(doc_id AS VARCHAR) || ':s'
                              || CAST(g // {SC_SHOT} AS VARCHAR)),
                          CAST(i * 2 + 1 AS INT), 2)
                 END AS hx
          FROM (SELECT doc_id, g, i FROM documents,
                (SELECT unnest(range(0, {SC_FRAMES})) AS g) tg,
                (SELECT unnest(range(0, {SC_BYTES})) AS i) ti) vg
        ),
        vvals AS (
          SELECT doc_id, f, i,
                 ({sc_hexd.format(i=1)}) * 16 + ({sc_hexd.format(i=2)})
                   AS v
          FROM vhx
        ),
        sweep AS (
          SELECT a.doc_id, l.l,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(a.v * v.v) AS BIGINT) AS sab,
                 CAST(sum(a.v) AS BIGINT) AS sa,
                 CAST(sum(v.v) AS BIGINT) AS sb
          FROM avals a
          JOIN (SELECT unnest([{_av_lag_list}]) AS l) l ON TRUE
          JOIN vvals v ON v.doc_id = a.doc_id AND v.i = a.i
                      AND v.f = a.g - l.l
          GROUP BY a.doc_id, l.l
        ),
        ranked AS (
          SELECT doc_id, l, n * sab - sa * sb AS score,
                 row_number() OVER (PARTITION BY doc_id
                     ORDER BY n * sab - sa * sb DESC, abs(l), l) AS rn
          FROM sweep
        )
        SELECT doc_id,
               CAST(doc_id % {AV_LAGS} - {_av_half} AS BIGINT)
                 AS true_lag,
               CAST(l AS BIGINT) AS est_lag,
               CAST(score AS BIGINT) AS best_score
        FROM ranked WHERE rn = 1
    """

    o["multimodal_audio_energy"] = f"""
        WITH ks AS (
          SELECT doc_id, unnest(range(0, {AUDIO_CHUNKS * AUDIO_WIN}))
                   AS k
          FROM documents
        ),
        hx4 AS (
          SELECT doc_id, k,
                 substr(md5(CAST(doc_id AS VARCHAR) || ':a'
                            || CAST(k // {AUDIO_WIN} AS VARCHAR)),
                        CAST((k % {AUDIO_WIN}) * 4 + 1 AS INT), 4) AS hx
          FROM ks
        ),
        vals AS (
          SELECT doc_id, k,
                 ({hexd.format(i=1)}) * 4096
                 + ({hexd.format(i=2)}) * 256
                 + ({hexd.format(i=3)}) * 16
                 + ({hexd.format(i=4)}) AS v
          FROM hx4
        ),
        sv AS (
          SELECT doc_id, k,
                 CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS s
          FROM vals
        )
        SELECT doc_id, CAST(k // {AUDIO_WIN} AS INT) AS win_id,
               CAST(sum(s * s) AS BIGINT) AS energy,
               CAST(max(abs(s)) AS INT) AS peak
        FROM sv GROUP BY 1, 2
    """

    # VAD: same sample reconstruction, energy gate, then
    # gaps-and-islands over active windows — the run merge re-derived
    # independently in SQL
    from ..operators.multimodal import VAD_ENERGY_MIN

    o["multimodal_audio_vad"] = f"""
        WITH ks AS (
          SELECT doc_id, unnest(range(0, {AUDIO_CHUNKS * AUDIO_WIN}))
                   AS k
          FROM documents
        ),
        hx4 AS (
          SELECT doc_id, k,
                 substr(md5(CAST(doc_id AS VARCHAR) || ':a'
                            || CAST(k // {AUDIO_WIN} AS VARCHAR)),
                        CAST((k % {AUDIO_WIN}) * 4 + 1 AS INT), 4) AS hx
          FROM ks
        ),
        vals AS (
          SELECT doc_id, k,
                 ({hexd.format(i=1)}) * 4096
                 + ({hexd.format(i=2)}) * 256
                 + ({hexd.format(i=3)}) * 16
                 + ({hexd.format(i=4)}) AS v
          FROM hx4
        ),
        sv AS (
          SELECT doc_id, k,
                 CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS s
          FROM vals
        ),
        wins AS (
          SELECT doc_id, k // {AUDIO_WIN} AS win_id,
                 sum(s * s) > {VAD_ENERGY_MIN} AS active
          FROM sv GROUP BY 1, 2
        ),
        runs AS (
          SELECT doc_id, win_id, active,
                 win_id - row_number() OVER (
                   PARTITION BY doc_id, active ORDER BY win_id)
                   AS island
          FROM wins
        ),
        segs AS (
          SELECT doc_id, island, count(*) AS run_len
          FROM runs WHERE active GROUP BY 1, 2
        )
        SELECT w.doc_id,
               CAST(count(*) AS BIGINT) AS n_windows,
               CAST(sum(CASE WHEN w.active THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_active,
               CAST(coalesce(max(st.n_segs), 0) AS BIGINT)
                 AS n_segments,
               CAST(coalesce(max(st.longest), 0) AS BIGINT)
                 AS longest_run
        FROM wins w
        LEFT JOIN (
          SELECT doc_id, count(*) AS n_segs, max(run_len) AS longest
          FROM segs GROUP BY doc_id
        ) st ON st.doc_id = w.doc_id
        GROUP BY w.doc_id
    """

    from ..operators.textops import (
        REP_DUP2_MAX,
        REP_DUP3_MAX,
        REP_TOP_TOKEN_MAX,
    )

    def grams(k: int) -> str:
        return (
            f"list_transform(range(1, greatest(len(t) - {k - 1}, 0) + 1), "
            f"i -> array_to_string(t[i:i + {k - 1}], ' '))"
        )

    def dup_frac(g: str) -> str:
        return (
            f"CASE WHEN len({g}) > 0 "
            f"THEN 1 - len(list_distinct({g})) / len({g}) ELSE 0.0 END"
        )

    o["doc_repetition"] = f"""
        SELECT doc_id, n_tokens, dup_2gram_frac, dup_3gram_frac,
               top_token_frac,
               (dup_2gram_frac > {REP_DUP2_MAX}
                OR dup_3gram_frac > {REP_DUP3_MAX}
                OR top_token_frac > {REP_TOP_TOKEN_MAX}) AS repetitive
        FROM (
          SELECT doc_id,
                 CAST(len(t) AS INT) AS n_tokens,
                 {dup_frac(grams(2))} AS dup_2gram_frac,
                 {dup_frac(grams(3))} AS dup_3gram_frac,
                 CASE WHEN len(t) > 0
                      THEN list_max(list_transform(list_distinct(t),
                           x -> len(list_filter(t, y -> y = x)))) / len(t)
                      ELSE 0.0 END AS top_token_frac
          FROM (SELECT doc_id, {TOKS} AS t FROM documents) u
        ) f
    """

    from ..operators.textops import (
        BM25_B,
        BM25_K1,
        BM25_QUERY_TERMS,
        BM25_TOP_K,
        TFIDF_TOP_K,
    )

    # same score expression shape as the Spark side: exact-integer
    # inputs through one division and one multiply (rational idf — no
    # libm log), so the doubles hash bit-identically.
    tfidf_score = "t.tf * ((s.n + 1) / (d.df + 1))"
    o["tfidf_keywords"] = f"""
        WITH tok AS (
          SELECT doc_id, unnest({TOKS}) AS token FROM documents
        ),
        tf AS (
          SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
          FROM tok GROUP BY doc_id, token
        ),
        dfs AS (
          SELECT token, CAST(count(*) AS BIGINT) AS df
          FROM tf GROUP BY token
        ),
        stats AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
        SELECT doc_id, token, tf, df, score, CAST(rk AS INT) AS rk FROM (
          SELECT t.doc_id, t.token, t.tf, d.df,
                 {tfidf_score} AS score,
                 row_number() OVER (PARTITION BY t.doc_id
                   ORDER BY {tfidf_score} DESC, t.token) AS rk
          FROM tf t JOIN dfs d USING (token) CROSS JOIN stats s
        ) u WHERE rk <= {TFIDF_TOP_K}
    """

    # All float literals CAST to DOUBLE (DuckDB parses bare 1.2 as
    # DECIMAL, whose arithmetic differs from Spark's doubles); the
    # expression tree mirrors the Spark side op-for-op so IEEE
    # correctly-rounded +,-,*,/ make the scores bit-identical.
    def _dbl(x: float) -> str:
        return f"CAST({x!r} AS DOUBLE)"

    bm_df_cols = ", ".join(
        f"CAST(sum(CASE WHEN list_contains(t, '{term}') THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS df_{i}"
        for i, term in enumerate(BM25_QUERY_TERMS)
    )
    bm_terms = []
    for i, term in enumerate(BM25_QUERY_TERMS):
        tf = f"len(list_filter(t, y -> y = '{term}'))"
        denom = (
            f"({tf} + {_dbl(BM25_K1)} * ({_dbl(1 - BM25_B)} + {_dbl(BM25_B)}"
            f" * ((n_tokens * n) / sumlen)))"
        )
        bm_terms.append(
            f"CASE WHEN {tf} > 0 THEN"
            f" ((n - df_{i} + {_dbl(0.5)}) / (df_{i} + {_dbl(0.5)}))"
            f" * ({tf} * {_dbl(BM25_K1 + 1)}) / {denom}"
            f" ELSE {_dbl(0.0)} END"
        )
    o["bm25_search"] = f"""
        WITH d AS (
          SELECT doc_id, {TOKS} AS t,
                 CAST(len({TOKS}) AS INT) AS n_tokens
          FROM documents
        ),
        stats AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(n_tokens) AS BIGINT) AS sumlen,
                 {bm_df_cols}
          FROM d
        ),
        scored AS (
          SELECT doc_id, n_tokens,
                 {' + '.join(bm_terms)} AS score
          FROM d, stats
        )
        SELECT doc_id, n_tokens, score, CAST(rn AS INT) AS rn FROM (
          SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rn
          FROM scored WHERE score > 0
        ) t WHERE rn <= {BM25_TOP_K}
    """

    o["doc_length_histogram"] = f"""
        SELECT n - (n % {HIST_BUCKET_TOKENS}) AS bucket_lo,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n) AS BIGINT) AS sum_tokens
        FROM (SELECT CAST(len({TOKS}) AS INT) AS n FROM documents) t
        GROUP BY 1
    """

    # per-lang length grid (round 10): integer n_chars interpolates
    # to exact quarter points — the ship_latency_percentiles protocol
    o["doc_length_quartiles_by_lang"] = """
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(min(n_chars) AS BIGINT) AS min_chars,
               round(quantile_cont(n_chars, 0.25), 2) AS p25_chars,
               round(quantile_cont(n_chars, 0.5), 2) AS p50_chars,
               round(quantile_cont(n_chars, 0.75), 2) AS p75_chars,
               CAST(max(n_chars) AS BIGINT) AS max_chars
        FROM documents GROUP BY lang
    """

    o["dedup_exact"] = """
        SELECT md5(text) AS text_hash,
               CAST(count(*) AS BIGINT) AS n_copies,
               min(doc_id) AS keeper_id
        FROM documents GROUP BY md5(text)
    """

    from ..operators.dedup import NORM_STRIP_REGEX

    o["dedup_normalized"] = f"""
        SELECT md5(trim(regexp_replace(lower(text), '{NORM_STRIP_REGEX}',
                                       ' ', 'g'))) AS norm_hash,
               CAST(count(*) AS BIGINT) AS n_copies,
               min(doc_id) AS keeper_id
        FROM documents GROUP BY 1
    """

    # per-source survivorship under the global min-doc_id keeper rule
    # (round 10): window min over the normalized digest, then a
    # |sources|-row rollup — the same shape the Spark operator plans
    o["dedup_survivorship_by_source"] = f"""
        WITH base AS (
          SELECT doc_id, source,
                 md5(text) AS text_hash,
                 md5(trim(regexp_replace(lower(text),
                          '{NORM_STRIP_REGEX}', ' ', 'g'))) AS norm_hash,
                 CAST(len({TOKS}) AS BIGINT) AS n_tok
          FROM documents
        ),
        flagged AS (
          SELECT source, text_hash, norm_hash, n_tok,
                 CAST(doc_id = min(doc_id) OVER (PARTITION BY norm_hash)
                      AS BIGINT) AS is_keeper
          FROM base
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT text_hash) AS BIGINT)
                 AS n_exact_distinct,
               CAST(count(DISTINCT norm_hash) AS BIGINT)
                 AS n_norm_distinct,
               CAST(sum(is_keeper) AS BIGINT) AS n_kept_docs,
               CAST(sum(n_tok) AS BIGINT) AS tokens_total,
               CAST(sum(is_keeper * n_tok) AS BIGINT) AS tokens_kept,
               CAST((1000 * sum(is_keeper * n_tok)) // sum(n_tok)
                    AS BIGINT) AS kept_permille
        FROM flagged GROUP BY source
    """

    # bucketed assignment ledger (round 10): the oracle is the pure
    # LOGICAL twin — bucketing is a layout decision the result must
    # be invariant to (any row the layout lost or duplicated
    # hash-mismatches here); tests/test_bucketing.py pins the
    # physical claim (zero Exchange) that is the operator's point
    o["bucketed_digest_dedup"] = f"""
        WITH base AS (
          SELECT doc_id, source,
                 md5(trim(regexp_replace(lower(text),
                          '{NORM_STRIP_REGEX}', ' ', 'g'))) AS digest
          FROM documents
        )
        SELECT doc_id, source, keeper_id,
               CAST(doc_id = keeper_id AS BIGINT) AS is_keeper
        FROM (
          SELECT doc_id, source,
                 min(doc_id) OVER (PARTITION BY digest) AS keeper_id
          FROM base
        ) t
    """

    o["dedup_ngram_jaccard"] = f"""
        WITH {_shingle_cte(SHINGLE_K)},
        doc_freq AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
        sizes0 AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        ranked AS (
          SELECT sh.doc_id, sh.s,
                 row_number() OVER (PARTITION BY sh.doc_id
                                    ORDER BY doc_freq.df, sh.s) AS rk,
                 sizes0.n
          FROM sh JOIN doc_freq USING (s)
                  JOIN sizes0 ON sizes0.doc_id = sh.doc_id
        ),
        prefix AS (
          SELECT doc_id, s FROM ranked
          WHERE rk <= n - (({JACCARD_NUM} * n + {JACCARD_DEN - 1})
                           // {JACCARD_DEN}) + 1
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
          FROM prefix a JOIN prefix b USING (s) WHERE a.doc_id < b.doc_id
        ),
        {_VERIFY.lstrip()}
        SELECT da, db, jaccard FROM verified WHERE jaccard >= {JACCARD_THRESHOLD}
    """

    sig_cols = ", ".join(
        f"min(substr(md5('{k}:' || s), 1, 16)) AS sig{k}" for k in range(MINHASH_K)
    )
    band_elems = ", ".join(
        f"'{b}:' || md5(sig{2 * b} || sig{2 * b + 1})" for b in range(MINHASH_BANDS)
    )
    minhash_base = f"""{_shingle_cte(SHINGLE_K)},
        sigs AS (SELECT doc_id, {sig_cols} FROM sh GROUP BY doc_id),
        buckets AS (SELECT doc_id, unnest([{band_elems}]) AS band FROM sigs)"""
    # the production candidate CTE carries the same hot-bucket guard
    # as the engine (_band_candidates): buckets past BAND_MAX_OCCUPANCY
    # are boilerplate collisions, excluded from pair generation. Inert
    # on graded data (max occupancy is single-digit at every SF).
    minhash_ctes = f"""{minhash_base},
        hot AS (
          SELECT band FROM buckets GROUP BY band
          HAVING count(*) > {BAND_MAX_OCCUPANCY}
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
          FROM buckets a JOIN buckets b USING (band)
          WHERE a.doc_id < b.doc_id
            AND band NOT IN (SELECT band FROM hot)
        ),
        {_VERIFY.lstrip()}"""
    o["dedup_minhash_lsh"] = f"""
        WITH {minhash_ctes}
        SELECT da, db, jaccard FROM verified WHERE jaccard >= {MINHASH_VERIFY_MIN}
    """

    # the guard's graded sf-scale observable: occupancy census over
    # the same banding CTE; on shipped data n_hot_buckets = 0 and the
    # capped/uncapped pair volumes must agree
    o["band_occupancy_census"] = f"""
        WITH {minhash_base},
        sizes AS (
          SELECT band, CAST(count(*) AS BIGINT) AS c
          FROM buckets GROUP BY band
        )
        SELECT CAST(sum(c) // {MINHASH_BANDS} AS BIGINT) AS n_indexed_docs,
               CAST(count(*) AS BIGINT) AS n_buckets,
               max(c) AS max_occupancy,
               CAST(sum(CASE WHEN c > {BAND_MAX_OCCUPANCY}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_hot_buckets,
               CAST(sum(c * (c - 1)) // 2 AS BIGINT) AS n_candidate_pairs,
               CAST(sum(CASE WHEN c <= {BAND_MAX_OCCUPANCY}
                        THEN c * (c - 1) ELSE 0 END) // 2 AS BIGINT)
                 AS n_candidate_pairs_capped
        FROM sizes
    """

    # in-band recall-trade report: verified output volume next to the
    # guard's dropped-bucket accounting, one row (ADVICE r8)
    o["dedup_guard_report"] = f"""
        WITH {minhash_ctes},
        sizes AS (
          SELECT band, CAST(count(*) AS BIGINT) AS c
          FROM buckets GROUP BY band
        )
        SELECT CAST({BAND_MAX_OCCUPANCY} AS BIGINT) AS occupancy_cap,
               (SELECT CAST(count(*) AS BIGINT) FROM verified
                WHERE jaccard >= {MINHASH_VERIFY_MIN})
                 AS n_verified_pairs,
               CAST(coalesce(sum(CASE WHEN c > {BAND_MAX_OCCUPANCY}
                        THEN 1 ELSE 0 END), 0) AS BIGINT)
                 AS n_hot_buckets_dropped,
               CAST(coalesce(sum(CASE WHEN c > {BAND_MAX_OCCUPANCY}
                        THEN c * (c - 1) ELSE 0 END), 0) // 2 AS BIGINT)
                 AS n_dropped_bucket_pairs
        FROM sizes
    """

    # multiset (weighted) token Jaccard on the capped candidate set:
    # Σmax = na + nb − Σmin, so the inner join over SHARED tokens
    # plus per-doc totals suffices — identical shape on both engines
    o["dedup_multiset_jaccard"] = f"""
        WITH {minhash_ctes},
        tok AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
        tc AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
               FROM tok GROUP BY 1, 2),
        tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
                       CAST(count(DISTINCT token) AS BIGINT) AS nd
                FROM tok GROUP BY 1),
        shared AS (
          SELECT cand.da, cand.db,
                 CAST(sum(least(a.c, b.c)) AS BIGINT) AS ms_min,
                 CAST(count(*) AS BIGINT) AS set_inter
          FROM cand
          JOIN tc a ON a.doc_id = cand.da
          JOIN tc b ON b.doc_id = cand.db AND b.token = a.token
          GROUP BY 1, 2
        )
        SELECT s.da, s.db,
               ta.n AS n_tokens_a, tb.n AS n_tokens_b, s.ms_min,
               CAST(1000 * s.ms_min // (ta.n + tb.n - s.ms_min)
                    AS BIGINT) AS multiset_jacc_permille,
               CAST(1000 * s.set_inter
                    // (ta.nd + tb.nd - s.set_inter)
                    AS BIGINT) AS set_jacc_permille
        FROM shared s
        JOIN tot ta ON ta.doc_id = s.da
        JOIN tot tb ON tb.doc_id = s.db
    """

    # near-dup pairs cross-tabbed by unordered source pair; the pair
    # generator is the capped production CTE nested verbatim
    o["dedup_cross_source_matrix"] = f"""
        WITH {minhash_ctes},
        vp AS (
          SELECT da, db FROM verified WHERE jaccard >= {MINHASH_VERIFY_MIN}
        ),
        cells AS (
          SELECT least(a.source, b.source) AS source_lo,
                 greatest(a.source, b.source) AS source_hi,
                 vp.da, vp.db
          FROM vp JOIN documents a ON a.doc_id = vp.da
                  JOIN documents b ON b.doc_id = vp.db
        ),
        np AS (
          SELECT source_lo, source_hi, CAST(count(*) AS BIGINT) AS n_pairs
          FROM cells GROUP BY 1, 2
        ),
        nd AS (
          SELECT source_lo, source_hi,
                 CAST(count(DISTINCT d) AS BIGINT) AS n_docs_involved
          FROM (SELECT source_lo, source_hi, da AS d FROM cells
                UNION ALL
                SELECT source_lo, source_hi, db FROM cells) u
          GROUP BY 1, 2
        )
        SELECT source_lo, source_hi, n_pairs, n_docs_involved,
               CAST(source_lo <> source_hi AS INT) AS is_cross_source
        FROM np JOIN nd USING (source_lo, source_hi)
    """

    # banding-loss calibration: truth re-derived from the EXHAUSTIVE
    # inverted-index candidate join + the same exact-Jaccard verify,
    # the minhash oracle nested verbatim as the prediction side —
    # BOTH sides restricted to the salted-hash doc sample (the eval's
    # executable 100 TB contract; sample size is a graded column)
    from ..operators.dedup import PR_EVAL_SAMPLE_MAX4, PR_EVAL_SAMPLE_SALT

    def _sampled(col: str) -> str:
        return (
            f"substr(md5('{PR_EVAL_SAMPLE_SALT}' || "
            f"CAST({col} AS VARCHAR)), 1, 4) < '{PR_EVAL_SAMPLE_MAX4}'"
        )

    o["minhash_dedup_pr_eval"] = f"""
        WITH {_shingle_cte(SHINGLE_K).lstrip()},
        sh_s AS (SELECT doc_id, s FROM sh WHERE {_sampled("doc_id")}),
        cand AS (
          SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
          FROM sh_s a JOIN sh_s b USING (s) WHERE a.doc_id < b.doc_id
        ),
        {_VERIFY.lstrip()},
        truth AS (
          SELECT da, db, 1 AS t FROM verified
          WHERE jaccard >= {MINHASH_VERIFY_MIN}
        ),
        pred AS (
          SELECT da, db, 1 AS p FROM ({o["dedup_minhash_lsh"]}) mh
          WHERE {_sampled("da")} AND {_sampled("db")}
        ),
        j AS (
          SELECT coalesce(p, 0) AS p, coalesce(t, 0) AS t
          FROM pred FULL JOIN truth USING (da, db)
        ),
        nsamp AS (
          SELECT CAST(count(*) AS BIGINT) AS n_sample_docs
          FROM documents WHERE {_sampled("doc_id")}
        ),
        stats AS (
          SELECT CAST(sum(p) AS BIGINT) AS n_pred,
                 CAST(sum(t) AS BIGINT) AS n_truth,
                 CAST(sum(p * t) AS BIGINT) AS tp,
                 CAST(CASE WHEN sum(p) = 0 THEN 0
                      ELSE 1000 * sum(p * t) // sum(p) END AS BIGINT)
                   AS precision_permille,
                 CAST(CASE WHEN sum(t) = 0 THEN 0
                      ELSE 1000 * sum(p * t) // sum(t) END AS BIGINT)
                   AS recall_permille
          FROM j
        )
        SELECT n_sample_docs, n_pred, n_truth, tp,
               precision_permille, recall_permille
        FROM nsamp CROSS JOIN stats
    """

    # estimator calibration: component equality recomputed per pair
    # from the same signature CTE; all-integer columns
    o["minhash_estimate_eval"] = f"""
        WITH {minhash_base},
        cand AS (
          SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
          FROM buckets a JOIN buckets b USING (band) WHERE a.doc_id < b.doc_id
        ),
        arrs AS (SELECT doc_id, list(s) AS arr FROM sh GROUP BY doc_id),
        m AS (
          SELECT c.da, c.db,
                 (CASE WHEN a.sig0 = b.sig0 THEN 1 ELSE 0 END + CASE WHEN a.sig1 = b.sig1 THEN 1 ELSE 0 END + CASE WHEN a.sig2 = b.sig2 THEN 1 ELSE 0 END + CASE WHEN a.sig3 = b.sig3 THEN 1 ELSE 0 END + CASE WHEN a.sig4 = b.sig4 THEN 1 ELSE 0 END + CASE WHEN a.sig5 = b.sig5 THEN 1 ELSE 0 END + CASE WHEN a.sig6 = b.sig6 THEN 1 ELSE 0 END + CASE WHEN a.sig7 = b.sig7 THEN 1 ELSE 0 END) AS n_match
          FROM cand c
          JOIN sigs a ON a.doc_id = c.da
          JOIN sigs b ON b.doc_id = c.db
        )
        SELECT m.da, m.db, CAST(n_match AS INT) AS n_match,
               CAST(len(list_intersect(a.arr, b.arr)) AS BIGINT)
                 AS inter_size,
               CAST(len(a.arr) + len(b.arr)
                    - len(list_intersect(a.arr, b.arr)) AS BIGINT)
                 AS union_size
        FROM m
        JOIN arrs a ON a.doc_id = m.da
        JOIN arrs b ON b.doc_id = m.db
    """

    # LSH banding S-curve: ONE superset candidate join (any single
    # component equal = the 8x1 bands), per-config collision
    # predicates over the joined signatures, conditional counts
    from ..operators.dedup import MINHASH_BAND_CONFIGS

    def _collide_sql(nb: int, rpb: int) -> str:
        bands = []
        for b in range(nb):
            eqs = " AND ".join(
                f"sa.sig{b * rpb + r} = sb.sig{b * rpb + r}"
                for r in range(rpb)
            )
            bands.append(f"({eqs})")
        return "(" + " OR ".join(bands) + ")"

    _cfg_sums = ",\n               ".join(
        f"CAST(sum(CASE WHEN {_collide_sql(nb, rpb)} THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS nc{nb},\n               "
        f"CAST(sum(CASE WHEN {_collide_sql(nb, rpb)} AND jaccard >="
        f" {MINHASH_VERIFY_MIN} THEN 1 ELSE 0 END) AS BIGINT) AS np{nb}"
        for nb, rpb in MINHASH_BAND_CONFIGS
    )
    _cfg_rows = " UNION ALL ".join(
        f"""SELECT CAST({nb} AS INT) AS n_bands,
               CAST({rpb} AS INT) AS rows_per_band,
               nc{nb} AS n_candidates, np{nb} AS n_pred, n_truth,
               CAST(CASE WHEN n_truth = 0 THEN 0
                    ELSE 1000 * np{nb} // n_truth END AS BIGINT)
                 AS recall_permille
        FROM wide"""
        for nb, rpb in MINHASH_BAND_CONFIGS
    )
    _single_bands = ", ".join(
        f"'{k}:' || sig{k}" for k in range(MINHASH_K)
    )
    o["minhash_band_tuning_eval"] = f"""
        WITH {_shingle_cte(SHINGLE_K).lstrip()},
        sh_s AS (SELECT doc_id, s FROM sh WHERE {_sampled("doc_id")}),
        sigs_s AS (SELECT doc_id, {sig_cols} FROM sh
                   WHERE {_sampled("doc_id")} GROUP BY doc_id),
        arrs AS (SELECT doc_id, list(s) AS arr FROM sh GROUP BY doc_id),
        cand_t AS (
          SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
          FROM sh_s a JOIN sh_s b USING (s) WHERE a.doc_id < b.doc_id
        ),
        tn AS (
          SELECT CAST(count(*) AS BIGINT) AS n_truth FROM (
            SELECT c.da FROM cand_t c
            JOIN arrs a ON a.doc_id = c.da
            JOIN arrs b ON b.doc_id = c.db
            WHERE round(len(list_intersect(a.arr, b.arr))
                  / (len(a.arr) + len(b.arr)
                     - len(list_intersect(a.arr, b.arr))), 4)
                  >= {MINHASH_VERIFY_MIN}
          ) v
        ),
        singles AS (
          SELECT doc_id, unnest([{_single_bands}]) AS band FROM sigs_s
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
          FROM singles a JOIN singles b USING (band)
          WHERE a.doc_id < b.doc_id
        ),
        ver AS (
          SELECT c.da, c.db,
                 round(len(list_intersect(a.arr, b.arr))
                  / (len(a.arr) + len(b.arr)
                     - len(list_intersect(a.arr, b.arr))), 4) AS jaccard
          FROM cand c
          JOIN arrs a ON a.doc_id = c.da
          JOIN arrs b ON b.doc_id = c.db
        ),
        wide AS (
          SELECT {_cfg_sums},
                 (SELECT n_truth FROM tn) AS n_truth
          FROM ver v
          JOIN sigs_s sa ON sa.doc_id = v.da
          JOIN sigs_s sb ON sb.doc_id = v.db
        )
        {_cfg_rows}
    """

    # b-bit minwise eval: same signature CTE, component equality
    # recomputed both at full width and on the lowest hex digit
    from ..operators.dedup import BBIT_HEX

    full_eq = " + ".join(
        f"CASE WHEN a.sig{k} = b.sig{k} THEN 1 ELSE 0 END"
        for k in range(MINHASH_K)
    )
    b4_eq = " + ".join(
        f"CASE WHEN substr(a.sig{k}, {17 - BBIT_HEX}, {BBIT_HEX})"
        f" = substr(b.sig{k}, {17 - BBIT_HEX}, {BBIT_HEX})"
        " THEN 1 ELSE 0 END"
        for k in range(MINHASH_K)
    )
    o["minhash_bbit_eval"] = f"""
        WITH {minhash_base},
        cand AS (
          SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
          FROM buckets a JOIN buckets b USING (band) WHERE a.doc_id < b.doc_id
        )
        SELECT c.da, c.db,
               CAST({full_eq} AS INT) AS n_match,
               CAST({b4_eq} AS INT) AS n_match_b4
        FROM cand c
        JOIN sigs a ON a.doc_id = c.da
        JOIN sigs b ON b.doc_id = c.db
    """

    # fuzzy decontamination: the SAME band index + exact-Jaccard
    # verify, candidates restricted across the train/eval split
    from ..operators.curation import FUZZY_EVAL_MOD

    o["decontaminate_fuzzy"] = f"""
        WITH {minhash_base},
        cand AS (
          SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
          FROM buckets a JOIN buckets b USING (band)
          WHERE a.doc_id % {FUZZY_EVAL_MOD} <> 0
            AND b.doc_id % {FUZZY_EVAL_MOD} = 0
        ),
        {_VERIFY.lstrip()}
        SELECT da AS doc_id,
               CAST(count(DISTINCT db) AS BIGINT) AS n_eval_near,
               max(jaccard) AS max_jaccard
        FROM verified
        WHERE jaccard >= {MINHASH_VERIFY_MIN}
        GROUP BY da
    """

    from ..operators.dedup import CONTAINMENT_MIN

    # containment shares the band-index candidate CTE with the
    # Jaccard pass; DuckDB's / on integers is float division, same
    # IEEE graph as Spark's
    o["minhash_containment"] = f"""
        WITH {minhash_base},
        hot AS (
          SELECT band FROM buckets GROUP BY band
          HAVING count(*) > {BAND_MAX_OCCUPANCY}
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
          FROM buckets a JOIN buckets b USING (band)
          WHERE a.doc_id < b.doc_id
            AND band NOT IN (SELECT band FROM hot)
        ),
        arrs AS (SELECT doc_id, list(s) AS arr FROM sh GROUP BY doc_id),
        scored AS (
          SELECT c.da, c.db,
                 round(len(list_intersect(a.arr, b.arr)) / len(a.arr), 4)
                   AS containment_a,
                 round(len(list_intersect(a.arr, b.arr)) / len(b.arr), 4)
                   AS containment_b,
                 CAST(len(a.arr) AS BIGINT) AS n_a,
                 CAST(len(b.arr) AS BIGINT) AS n_b
          FROM cand c
          JOIN arrs a ON a.doc_id = c.da
          JOIN arrs b ON b.doc_id = c.db
        )
        SELECT * FROM scored
        WHERE greatest(containment_a, containment_b) >= {CONTAINMENT_MIN}
    """

    # composed FROM the minhash pipeline + the doc→source lookup; max
    # (not mean) of rounded jaccards keeps the agg order-insensitive
    o["source_overlap"] = f"""
        WITH {minhash_ctes}
        SELECT least(sa.source, sb.source) AS source_a,
               greatest(sa.source, sb.source) AS source_b,
               CAST(count(*) AS BIGINT) AS n_pairs,
               max(jaccard) AS max_jaccard
        FROM verified v
        JOIN documents sa ON sa.doc_id = v.da
        JOIN documents sb ON sb.doc_id = v.db
        WHERE v.jaccard >= {MINHASH_VERIFY_MIN}
        GROUP BY 1, 2
    """

    from ..operators.dedup import EDIT_DEN, EDIT_NUM

    # same band-index candidates, verified by character edit distance.
    # DuckDB's levenshtein counts BYTES where Spark counts chars —
    # equal on this pure-ASCII corpus (pinned by a test). The ratio
    # rule runs in exact integer arithmetic on both sides.
    o["dedup_editdist"] = f"""
        WITH {minhash_base},
        cand AS (
          SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
          FROM buckets a JOIN buckets b USING (band) WHERE a.doc_id < b.doc_id
        ),
        scored AS (
          SELECT c.da, c.db,
                 CAST(levenshtein(x.text, y.text) AS INT) AS edit_dist,
                 greatest(length(x.text), length(y.text)) AS max_len
          FROM cand c
          JOIN documents x ON x.doc_id = c.da
          JOIN documents y ON y.doc_id = c.db
          WHERE {EDIT_DEN} * abs(length(x.text) - length(y.text))
                  <= {EDIT_NUM} * greatest(length(x.text), length(y.text))
        )
        SELECT da, db, edit_dist,
               round(edit_dist / max_len, 4) AS edit_ratio
        FROM scored
        WHERE {EDIT_DEN} * edit_dist <= {EDIT_NUM} * max_len
    """

    # DL twin: DuckDB's damerau_levenshtein IS the unrestricted
    # Lowrance–Wagner distance (validated in tests incl. the OSA
    # distinguisher); thresholded-lev -1s map to NULL via the CASE
    o["dedup_editdist_dl"] = f"""
        WITH {minhash_base},
        cand AS (
          SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
          FROM buckets a JOIN buckets b USING (band) WHERE a.doc_id < b.doc_id
        ),
        scored AS (
          SELECT c.da, c.db,
                 CAST(levenshtein(x.text, y.text) AS INT) AS lev_full,
                 CAST(damerau_levenshtein(x.text, y.text) AS INT)
                   AS dl_dist,
                 greatest(length(x.text), length(y.text)) AS max_len,
                 CAST(floor({EDIT_NUM} * greatest(length(x.text),
                        length(y.text)) / {EDIT_DEN}) AS INT) AS thr
          FROM cand c
          JOIN documents x ON x.doc_id = c.da
          JOIN documents y ON y.doc_id = c.db
          WHERE {EDIT_DEN} * abs(length(x.text) - length(y.text))
                  <= {EDIT_NUM} * greatest(length(x.text), length(y.text))
        )
        SELECT da, db, dl_dist,
               CASE WHEN lev_full <= thr THEN lev_full END AS lev_dist,
               CASE WHEN lev_full <= thr THEN lev_full - dl_dist END
                 AS transposition_gain
        FROM scored
        WHERE {EDIT_DEN} * dl_dist <= {EDIT_NUM} * max_len
    """

    # components = transitive closure of the verified-pair graph; the
    # recursive CTE computes, for each doc, every reachable doc and
    # keeps the minimum as the cluster label — independent derivation
    # of what the Spark side reaches by iterative label propagation.
    o["dedup_clusters"] = f"""
        WITH RECURSIVE {minhash_ctes},
        pairs AS (SELECT da, db FROM verified
                  WHERE jaccard >= {MINHASH_VERIFY_MIN}),
        edges AS (SELECT da AS u, db AS v FROM pairs
                  UNION SELECT db AS u, da AS v FROM pairs),
        reach AS (
          SELECT u, u AS l FROM (SELECT DISTINCT u FROM edges) t
          UNION
          SELECT e.u, r.l FROM edges e JOIN reach r ON r.u = e.v
        )
        SELECT doc_id, cluster_id,
               CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
                 AS cluster_size
        FROM (SELECT u AS doc_id, min(l) AS cluster_id
              FROM reach GROUP BY u) c
    """

    # cluster-size histogram: same recursive components, singleton
    # mass derived as total − clustered so shares sum to 1e6 ppm
    o["dedup_cluster_size_histogram"] = f"""
        WITH RECURSIVE {minhash_ctes},
        pairs AS (SELECT da, db FROM verified
                  WHERE jaccard >= {MINHASH_VERIFY_MIN}),
        edges AS (SELECT da AS u, db AS v FROM pairs
                  UNION SELECT db AS u, da AS v FROM pairs),
        reach AS (
          SELECT u, u AS l FROM (SELECT DISTINCT u FROM edges) t
          UNION
          SELECT e.u, r.l FROM edges e JOIN reach r ON r.u = e.v
        ),
        comp AS (SELECT u AS doc_id, min(l) AS cluster_id
                 FROM reach GROUP BY u),
        sized AS (SELECT cluster_id,
                         CAST(count(*) AS BIGINT) AS cluster_size
                  FROM comp GROUP BY 1),
        hist AS (
          SELECT cluster_size,
                 CAST(count(*) AS BIGINT) AS n_clusters,
                 CAST(sum(cluster_size) AS BIGINT) AS n_docs
          FROM sized GROUP BY 1
          UNION ALL
          SELECT CAST(1 AS BIGINT),
                 t.td - c.cd,
                 t.td - c.cd
          FROM (SELECT CAST(count(*) AS BIGINT) AS td
                FROM documents) t,
               (SELECT CAST(count(*) AS BIGINT) AS cd FROM comp) c
        )
        SELECT cluster_size, n_clusters, n_docs,
               CAST(1000000 * n_docs
                    // (SELECT CAST(count(*) AS BIGINT)
                        FROM documents) AS BIGINT) AS docs_share_ppm
        FROM hist
    """

    # soft weights: same recursive components, corpus-wide left join
    # fills singletons at full weight; integer floor-div permille
    from ..operators.dedup import CLUSTER_QUALITY_BUCKETS as _CQB

    CLUSTER_QUALITY_BUCKETS_SQL = _CQB

    o["dedup_cluster_quality"] = f"""
        WITH RECURSIVE {minhash_ctes},
        pairs AS (SELECT da, db FROM verified
                  WHERE jaccard >= {MINHASH_VERIFY_MIN}),
        edges AS (SELECT da AS u, db AS v FROM pairs
                  UNION SELECT db AS u, da AS v FROM pairs),
        reach AS (
          SELECT u, u AS l FROM (SELECT DISTINCT u FROM edges) t
          UNION
          SELECT e.u, r.l FROM edges e JOIN reach r ON r.u = e.v
        ),
        sized AS (
          SELECT doc_id,
                 count(*) OVER (PARTITION BY cluster_id) AS cs
          FROM (SELECT u AS doc_id, min(l) AS cluster_id
                FROM reach GROUP BY u) c
        ),
        q AS (
          SELECT doc_id,
                 CAST(floor(1000 * (
                   0.25 * (len(regexp_extract_all(text,
                            '{quality_stop_pattern()}')) / len({TOKS}))
                   + 0.25 * (len(list_distinct({TOKS})) / len({TOKS}))
                   + 0.25 * (1 - len(regexp_extract_all(text,
                              '{PUNCT_REGEX}')) / length(text))
                   + 0.25 * least(len({TOKS}) / 100, 1.0)
                 )) AS BIGINT) AS q_permille,
                 CAST(len({TOKS}) AS BIGINT) AS n_tokens
          FROM documents
        ),
        tiers AS (
          SELECT {CLUSTER_QUALITY_BUCKETS_SQL} AS dup_tier,
                 q_permille, n_tokens
          FROM (
            SELECT q.q_permille, q.n_tokens,
                   coalesce(s.cs, 1) AS cs
            FROM q LEFT JOIN sized s ON s.doc_id = q.doc_id
          ) jj
        )
        SELECT dup_tier,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(q_permille) AS BIGINT) AS sum_q_permille,
               CAST(sum(q_permille) // count(*) AS BIGINT)
                 AS mean_q_permille,
               CAST(sum(n_tokens) // count(*) AS BIGINT) AS mean_tokens
        FROM tiers GROUP BY dup_tier
    """

    o["dedup_soft_weights"] = f"""
        WITH RECURSIVE {minhash_ctes},
        pairs AS (SELECT da, db FROM verified
                  WHERE jaccard >= {MINHASH_VERIFY_MIN}),
        edges AS (SELECT da AS u, db AS v FROM pairs
                  UNION SELECT db AS u, da AS v FROM pairs),
        reach AS (
          SELECT u, u AS l FROM (SELECT DISTINCT u FROM edges) t
          UNION
          SELECT e.u, r.l FROM edges e JOIN reach r ON r.u = e.v
        ),
        sized AS (
          SELECT doc_id,
                 count(*) OVER (PARTITION BY cluster_id) AS cs
          FROM (SELECT u AS doc_id, min(l) AS cluster_id
                FROM reach GROUP BY u) c
        )
        SELECT d.doc_id,
               CAST(coalesce(cs, 1) AS BIGINT) AS cluster_size,
               CAST(greatest(1, 1000 // coalesce(cs, 1)) AS BIGINT)
                 AS weight_permille
        FROM documents d LEFT JOIN sized s ON s.doc_id = d.doc_id
    """

    # histogram over the same recursive-CTE components + the
    # singleton remainder from the documents total
    o["dedup_graph_stats"] = f"""
        WITH RECURSIVE {minhash_ctes},
        pairs AS (SELECT da, db FROM verified
                  WHERE jaccard >= {MINHASH_VERIFY_MIN}),
        edges AS (SELECT da AS u, db AS v FROM pairs
                  UNION SELECT db AS u, da AS v FROM pairs),
        reach AS (
          SELECT u, u AS l FROM (SELECT DISTINCT u FROM edges) t
          UNION
          SELECT e.u, r.l FROM edges e JOIN reach r ON r.u = e.v
        ),
        labels AS (SELECT u AS doc_id, min(l) AS cluster_id
                   FROM reach GROUP BY u),
        sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT)
                    AS cluster_size FROM labels GROUP BY cluster_id),
        hist AS (
          SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
                 CAST(sum(cluster_size) AS BIGINT) AS n_docs
          FROM sizes GROUP BY cluster_size
        ),
        single AS (
          SELECT CAST(1 AS BIGINT) AS cluster_size,
                 CAST((SELECT count(*) FROM documents)
                      - (SELECT count(*) FROM labels) AS BIGINT)
                   AS n_clusters,
                 CAST((SELECT count(*) FROM documents)
                      - (SELECT count(*) FROM labels) AS BIGINT)
                   AS n_docs
        )
        SELECT * FROM hist UNION ALL SELECT * FROM single
    """

    # triangles: canonical-order triple join over the same edges
    o["dedup_graph_triangles"] = f"""
        WITH {minhash_ctes},
        pairs AS (SELECT da, db FROM verified
                  WHERE jaccard >= {MINHASH_VERIFY_MIN}),
        e AS (SELECT DISTINCT least(da, db) AS a, greatest(da, db) AS b
              FROM pairs WHERE da != db),
        tri AS (
          SELECT ab.a, ab.b, bc.b AS c
          FROM e ab
          JOIN e bc ON bc.a = ab.b
          JOIN e ac ON ac.a = ab.a AND ac.b = bc.b
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles
        FROM (
          SELECT unnest([a, b, c]) AS doc_id FROM tri
        ) m GROUP BY doc_id
    """

    # fixed-point PageRank over the same verified-pair graph: the
    # three rounds unroll to plain CTEs running the IDENTICAL integer
    # expression graph (floor divisions), so the hash is bit-exact
    from ..operators.dedup import PR_ITERS, PR_SCALE, PR_TOP

    pr_base = (15 * PR_SCALE) // 100
    pr_rounds = []
    pr_prev = "r0"
    for i in range(1, PR_ITERS + 1):
        pr_rounds.append(
            f"""
        c{i} AS (SELECT e.v AS u, sum(r.r // g.d) AS s
                 FROM edges e JOIN {pr_prev} r ON r.u = e.u
                              JOIN deg g ON g.u = e.u
                 GROUP BY e.v),
        r{i} AS (SELECT g.u,
                        CAST({pr_base} + coalesce((85 * c.s) // 100, 0)
                             AS BIGINT) AS r
                 FROM deg g LEFT JOIN c{i} c ON c.u = g.u)"""
        )
        pr_prev = f"r{i}"
    o["doc_pagerank"] = f"""
        WITH {minhash_ctes},
        pairs AS (SELECT da, db FROM verified
                  WHERE jaccard >= {MINHASH_VERIFY_MIN}),
        edges AS (SELECT da AS u, db AS v FROM pairs
                  UNION SELECT db AS u, da AS v FROM pairs),
        deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d
                FROM edges GROUP BY u),
        r0 AS (SELECT u, CAST({PR_SCALE} AS BIGINT) AS r FROM deg),
        {','.join(pr_rounds)}
        SELECT r.u AS doc_id, g.d AS degree, r.r AS pagerank
        FROM {pr_prev} r JOIN deg g USING (u)
        ORDER BY pagerank DESC, doc_id LIMIT {PR_TOP}
    """

    # keeper election composed from the cluster and quality oracles:
    # highest quality wins, ties to the lowest doc_id — mirrored by
    # the Spark side's struct-max
    o["dedup_canonical"] = f"""
        WITH RECURSIVE {minhash_ctes},
        pairs AS (SELECT da, db FROM verified
                  WHERE jaccard >= {MINHASH_VERIFY_MIN}),
        edges AS (SELECT da AS u, db AS v FROM pairs
                  UNION SELECT db AS u, da AS v FROM pairs),
        reach AS (
          SELECT u, u AS l FROM (SELECT DISTINCT u FROM edges) t
          UNION
          SELECT e.u, r.l FROM edges e JOIN reach r ON r.u = e.v
        ),
        labels AS (SELECT u AS doc_id, min(l) AS cluster_id
                   FROM reach GROUP BY u),
        sized AS (
          SELECT doc_id, cluster_id,
                 CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
                   AS cluster_size
          FROM labels
        ),
        q AS ({o['quality_score']}),
        m AS (
          SELECT s.doc_id, s.cluster_id, s.cluster_size, q.quality
          FROM sized s JOIN q USING (doc_id)
        )
        SELECT doc_id, cluster_id, cluster_size, quality, keeper_id,
               doc_id = keeper_id AS keep
        FROM (
          SELECT m.*,
                 first_value(doc_id) OVER (
                   PARTITION BY cluster_id
                   ORDER BY quality DESC, doc_id ASC) AS keeper_id
          FROM m
        ) t
    """

    # survivorship-bias audit: the canonical election nested verbatim
    # supplies the dropped set; shares are floor(1e6*occ/total) on
    # both engines and the head is (occ DESC, token)-deterministic
    from ..operators.dedup import SHIFT_TOP_K

    o["dedup_token_shift_report"] = f"""
        WITH dropped AS (
          SELECT doc_id FROM ({o['dedup_canonical']}) c WHERE NOT keep
        ),
        tok AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
        before_c AS (
          SELECT token, CAST(count(*) AS BIGINT) AS occ_before
          FROM tok GROUP BY 1
        ),
        after_c AS (
          SELECT token, CAST(count(*) AS BIGINT) AS occ_after
          FROM tok WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
          GROUP BY 1
        ),
        tb AS (SELECT CAST(sum(occ_before) AS BIGINT) AS t FROM before_c),
        ta AS (SELECT CAST(sum(occ_after) AS BIGINT) AS t FROM after_c),
        top AS (
          SELECT token, occ_before,
                 row_number() OVER (ORDER BY occ_before DESC, token) AS rk
          FROM before_c ORDER BY occ_before DESC, token
          LIMIT {SHIFT_TOP_K}
        )
        SELECT t.token, CAST(t.rk AS INT) AS rk, t.occ_before,
               CAST(coalesce(a.occ_after, 0) AS BIGINT) AS occ_after,
               CAST(1000000 * t.occ_before // tb.t AS BIGINT)
                 AS share_before_ppm,
               CAST(1000000 * coalesce(a.occ_after, 0) // ta.t AS BIGINT)
                 AS share_after_ppm,
               CAST(1000000 * coalesce(a.occ_after, 0) // ta.t
                    - 1000000 * t.occ_before // tb.t AS BIGINT)
                 AS shift_ppm
        FROM top t LEFT JOIN after_c a USING (token), tb, ta
    """

    from ..operators.dedup import (
        WINNOW_MAX_DF,
        WINNOW_MIN_SHARED,
        WINNOW_W,
    )

    # positional shingle hashes (NOT distinct — winnowing is over the
    # ordered sequence), window-min selection; DISTINCT after unnest
    # mirrors the Spark side's per-doc array_distinct.
    wk = SHINGLE_K - 1
    o["dedup_winnow"] = f"""
        WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
        shg AS (
          SELECT doc_id,
                 list_transform(range(1, greatest(len(t) - {wk}, 0) + 1),
                     i -> md5(array_to_string(t[i:i + {wk}], ' '))) AS h
          FROM toks
        ),
        fps AS (
          SELECT DISTINCT doc_id, unnest(
            CASE WHEN len(h) >= {WINNOW_W}
                 THEN list_transform(range(1, len(h) - {WINNOW_W - 1} + 1),
                      i -> list_min(h[i:i + {WINNOW_W - 1}]))
                 WHEN len(h) > 0 THEN [list_min(h)]
                 ELSE CAST([] AS VARCHAR[]) END) AS fp
          FROM shg
        ),
        rare AS (
          SELECT fp FROM fps GROUP BY fp
          HAVING count(*) <= {WINNOW_MAX_DF}
        ),
        kept AS (SELECT doc_id, fp FROM fps JOIN rare USING (fp))
        SELECT da, db, n_shared FROM (
          SELECT a.doc_id AS da, b.doc_id AS db,
                 CAST(count(*) AS BIGINT) AS n_shared
          FROM kept a JOIN kept b USING (fp)
          WHERE a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        ) t WHERE n_shared >= {WINNOW_MIN_SHARED}
    """

    from ..operators.dedup import INCR_BATCH_MOD, INCR_NO_MATCH

    # Composes the shared minhash base (sh → sigs → buckets) with the
    # batch/corpus split; `cand` keeps the (da=new, db=corpus) naming
    # so the _VERIFY fragment applies verbatim.
    o["dedup_incremental"] = f"""
        WITH {minhash_base},
        hashes AS (
          SELECT doc_id, md5(text) AS h,
                 doc_id % {INCR_BATCH_MOD} = 0 AS is_new
          FROM documents
        ),
        corpus_h AS (
          SELECT h, min(doc_id) AS match_id
          FROM hashes WHERE NOT is_new GROUP BY h
        ),
        new_h AS (SELECT doc_id, h FROM hashes WHERE is_new),
        exact AS (
          SELECT n.doc_id, 'exact' AS kind, c.match_id,
                 CAST(1.0 AS DOUBLE) AS jaccard
          FROM new_h n JOIN corpus_h c USING (h)
        ),
        rest AS (
          SELECT doc_id FROM new_h
          WHERE h NOT IN (SELECT h FROM corpus_h)
        ),
        corpus_bands AS (
          SELECT doc_id, band FROM buckets
          WHERE doc_id % {INCR_BATCH_MOD} <> 0
        ),
        hot AS (
          SELECT band FROM corpus_bands GROUP BY band
          HAVING count(*) > {BAND_MAX_OCCUPANCY}
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
          FROM buckets a
          JOIN rest r ON r.doc_id = a.doc_id
          JOIN corpus_bands b ON b.band = a.band
          WHERE a.band NOT IN (SELECT band FROM hot)
        ),
        {_VERIFY.lstrip()},
        near AS (
          SELECT da AS doc_id, 'near' AS kind, db AS match_id, jaccard
          FROM (
            SELECT *, row_number() OVER (PARTITION BY da
                      ORDER BY jaccard DESC, db) AS rn
            FROM verified WHERE jaccard >= {MINHASH_VERIFY_MIN}) t
          WHERE rn = 1
        ),
        uniq AS (
          SELECT doc_id, 'unique' AS kind,
                 CAST({INCR_NO_MATCH} AS BIGINT) AS match_id,
                 CAST(0.0 AS DOUBLE) AS jaccard
          FROM rest
          WHERE doc_id NOT IN (SELECT doc_id FROM near)
        )
        SELECT * FROM exact
        UNION ALL SELECT * FROM near
        UNION ALL SELECT * FROM uniq
    """
    # the streaming ingest path must union per-micro-batch dispositions
    # to exactly the batch answer — same oracle, so the gate proves it
    o["streaming_dedup_incremental"] = o["dedup_incremental"]

    bit_sums = ", ".join(
        f"sum(CASE WHEN ascii(substr(h, {j}, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(1, SIMHASH_BITS + 1)
    )
    packed = " + ".join(
        f"CASE WHEN b{j} > 0 THEN CAST({1 << (j - 1)} AS BIGINT) ELSE 0 END"
        for j in range(1, SIMHASH_BITS + 1)
    )
    width = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << width) - 1
    band_elems = ", ".join(
        f"((sim >> {band * width}) & {mask}) + {band * (1 << width)}"
        for band in range(SIMHASH_BANDS)
    )
    o["dedup_simhash"] = f"""
        WITH tok AS (
          SELECT doc_id, md5(unnest({TOKS})) AS h FROM documents
        ),
        bit_sums AS (SELECT doc_id, {bit_sums} FROM tok GROUP BY doc_id),
        hashed AS (SELECT doc_id, ({packed}) AS sim FROM bit_sums),
        buckets AS (SELECT doc_id, sim, unnest([{band_elems}]) AS band
                    FROM hashed),
        cand AS (
          SELECT a.doc_id AS da, b.doc_id AS db,
                 a.sim AS sa, b.sim AS sb
          FROM buckets a JOIN buckets b USING (band)
          WHERE a.doc_id < b.doc_id
        )
        SELECT DISTINCT da, db,
               CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(sa, sb)) <= {SIMHASH_MAX_HAMMING}
    """

    # modality agreement: the three verified pair sets composed with
    # renamed CTEs (simhash's tok/buckets/cand collide with
    # minhash's), flags via left joins over the distinct union
    o["dedup_modality_agreement"] = f"""
        WITH {minhash_ctes},
        mpairs AS (
          SELECT da, db FROM verified
          WHERE jaccard >= {MINHASH_VERIFY_MIN}
        ),
        stok AS (
          SELECT doc_id, md5(unnest({TOKS})) AS h FROM documents
        ),
        sbs AS (SELECT doc_id, {bit_sums} FROM stok GROUP BY doc_id),
        shash AS (SELECT doc_id, ({packed}) AS sim FROM sbs),
        sbuck AS (SELECT doc_id, sim, unnest([{band_elems}]) AS band
                  FROM shash),
        spairs AS (
          SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
          FROM sbuck a JOIN sbuck b USING (band)
          WHERE a.doc_id < b.doc_id
            AND bit_count(xor(a.sim, b.sim)) <= {SIMHASH_MAX_HAMMING}
        ),
        epairs AS (
          SELECT c.da, c.db
          FROM cand c
          JOIN documents x ON x.doc_id = c.da
          JOIN documents y ON y.doc_id = c.db
          WHERE {EDIT_DEN} * abs(length(x.text) - length(y.text))
                  <= {EDIT_NUM} * greatest(length(x.text), length(y.text))
            AND {EDIT_DEN} * levenshtein(x.text, y.text)
                  <= {EDIT_NUM} * greatest(length(x.text), length(y.text))
        ),
        allp AS (
          SELECT da, db FROM mpairs
          UNION SELECT da, db FROM spairs
          UNION SELECT da, db FROM epairs
        )
        SELECT CAST(CASE WHEN m.da IS NULL THEN 0 ELSE 1 END AS BIGINT)
                 AS in_minhash,
               CAST(CASE WHEN sp.da IS NULL THEN 0 ELSE 1 END AS BIGINT)
                 AS in_simhash,
               CAST(CASE WHEN e.da IS NULL THEN 0 ELSE 1 END AS BIGINT)
                 AS in_editdist,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM allp a
        LEFT JOIN (SELECT DISTINCT da, db FROM mpairs) m
               ON m.da = a.da AND m.db = a.db
        LEFT JOIN (SELECT DISTINCT da, db FROM spairs) sp
               ON sp.da = a.da AND sp.db = a.db
        LEFT JOIN (SELECT DISTINCT da, db FROM epairs) e
               ON e.da = a.da AND e.db = a.db
        GROUP BY 1, 2, 3
    """

    # Composition of the already-generated quality / lang / dedup SQL —
    # the curation oracle can't drift from its components.
    # DP mechanism: identical md5 draw — magnitude = leading 1-bits
    # of 60 hash bits (bin + first-'0' position), sign = one more bit
    o["dp_noised_counts"] = """
        SELECT event_type,
               CAST(n AS BIGINT) AS true_n,
               CAST(n + sgn * mag AS BIGINT) AS released_n,
               CAST(sgn * mag AS BIGINT) AS noise
        FROM (
          SELECT event_type, n,
                 coalesce(nullif(strpos(lpad(bin(
                     CAST('0x' || substr(md5('dp-v1:' || event_type),
                                         1, 15) AS BIGINT)
                   ), 63, '0'), '0'), 0) - 1, 63) AS mag,
                 CASE WHEN CAST('0x' || substr(
                        md5('dp-v1:' || event_type), 16, 1) AS BIGINT)
                        % 2 = 0
                      THEN 1 ELSE -1 END AS sgn
          FROM (SELECT event_type, count(*) AS n
                FROM events GROUP BY event_type) c
        ) t
    """

    # privacy audit: cohort table + rollup restated in SQL; all
    # counts exact integers (thresholds mirrored from curation.ANON_K)
    from ..operators.curation import ANON_K

    o["k_anonymity_audit"] = f"""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_cohorts,
               CAST(sum(n) AS BIGINT) AS n_rows,
               CAST(min(n) AS BIGINT) AS min_cohort,
               CAST(sum(CASE WHEN n < {ANON_K} THEN 1 ELSE 0 END)
                    AS BIGINT) AS k_violating_cohorts,
               CAST(sum(CASE WHEN n < {ANON_K} THEN n ELSE 0 END)
                    AS BIGINT) AS k_violating_rows,
               CAST(sum(CASE WHEN n_users = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS l_homogeneous_cohorts
        FROM (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 CAST(floor(value / 50) * 50 AS BIGINT) AS band,
                 count(*) AS n, count(DISTINCT user_id) AS n_users
          FROM events GROUP BY 1, 2, 3
        ) c GROUP BY event_type
    """

    o["corpus_curation"] = f"""
        WITH q AS ({o['quality_score']}),
             l AS ({o['lang_id']}),
             k AS ({o['dedup_exact']})
        SELECT q.doc_id, l.pred_lang, q.n_tokens, q.len_chars,
               q.quality, k.n_copies
        FROM q JOIN l USING (doc_id) JOIN k ON k.keeper_id = q.doc_id
        WHERE q.quality >= {QUALITY_MIN}
          AND q.n_tokens BETWEEN {TOKENS_MIN} AND {TOKENS_MAX}
    """

    from ..operators.curation import PACK_BLOCK_DOCS, PACK_CTX_TOKENS

    # the greedy packing recurrence replayed doc-by-doc per block —
    # an independent derivation of the Arrow applyInPandas loop
    o["sequence_packing"] = f"""
        WITH RECURSIVE i AS (
          SELECT doc_id, doc_id // {PACK_BLOCK_DOCS} AS block_id,
                 CAST(len({TOKS}) AS BIGINT) AS n_tokens,
                 row_number() OVER (
                   PARTITION BY doc_id // {PACK_BLOCK_DOCS}
                   ORDER BY doc_id) AS rn
          FROM documents
        ),
        rec AS (
          SELECT block_id, rn, doc_id, n_tokens,
                 CAST(1 AS BIGINT) AS pack_id,
                 CAST(1 AS BIGINT) AS pack_pos,
                 n_tokens AS acc
          FROM i WHERE rn = 1
          UNION ALL
          SELECT i.block_id, i.rn, i.doc_id, i.n_tokens,
                 CASE WHEN r.acc + i.n_tokens <= {PACK_CTX_TOKENS}
                      THEN r.pack_id ELSE r.pack_id + 1 END,
                 CASE WHEN r.acc + i.n_tokens <= {PACK_CTX_TOKENS}
                      THEN r.pack_pos + 1 ELSE CAST(1 AS BIGINT) END,
                 CASE WHEN r.acc + i.n_tokens <= {PACK_CTX_TOKENS}
                      THEN r.acc + i.n_tokens ELSE i.n_tokens END
          FROM i JOIN rec r
            ON i.block_id = r.block_id AND i.rn = r.rn + 1
        )
        SELECT doc_id, block_id, n_tokens, pack_id, pack_pos,
               n_tokens > {PACK_CTX_TOKENS} AS truncated
        FROM rec
    """

    from ..operators.curation import DECONTAM_K, EVAL_MOD, QUALITY_HI

    # composed from the quality oracle so the gate booleans cannot
    # drift; only integer-derived stats are aggregated (see operator).
    # efficiency rollup over the NESTED packing oracle: pack count vs
    # the ceil(used/CTX) floor, utilization + overhead in permille
    o["sequence_packing_efficiency"] = f"""
        SELECT block_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(least(n_tokens, {PACK_CTX_TOKENS}))
                    AS BIGINT) AS used_tokens,
               CAST(count(DISTINCT pack_id) AS BIGINT) AS n_packs,
               CAST((sum(least(n_tokens, {PACK_CTX_TOKENS}))
                     + {PACK_CTX_TOKENS - 1})
                    // {PACK_CTX_TOKENS} AS BIGINT) AS lb_packs,
               CAST(1000 * sum(least(n_tokens, {PACK_CTX_TOKENS}))
                    // (count(DISTINCT pack_id) * {PACK_CTX_TOKENS})
                    AS BIGINT) AS utilization_permille,
               CAST(CASE WHEN (sum(least(n_tokens, {PACK_CTX_TOKENS}))
                               + {PACK_CTX_TOKENS - 1})
                              // {PACK_CTX_TOKENS} = 0 THEN 0
                    ELSE 1000 * (count(DISTINCT pack_id)
                         - (sum(least(n_tokens, {PACK_CTX_TOKENS}))
                            + {PACK_CTX_TOKENS - 1})
                           // {PACK_CTX_TOKENS})
                         // ((sum(least(n_tokens, {PACK_CTX_TOKENS}))
                              + {PACK_CTX_TOKENS - 1})
                             // {PACK_CTX_TOKENS})
                    END AS BIGINT) AS overhead_permille
        FROM ({o["sequence_packing"]}) sp
        GROUP BY block_id
    """

    o["source_quality"] = f"""
        WITH q AS ({o['quality_score']})
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(q.n_tokens), 2) AS mean_tokens,
               round(sum(CASE WHEN q.quality >= {QUALITY_MIN} THEN 1
                              ELSE 0 END) / count(*), 4) AS pass_rate,
               round(sum(CASE WHEN q.quality >= {QUALITY_HI} THEN 1
                              ELSE 0 END) / count(*), 4) AS hi_rate
        FROM q JOIN documents d USING (doc_id)
        GROUP BY d.source
    """

    o["decontaminate"] = f"""
        WITH {_shingle_cte(DECONTAM_K)},
        train AS (SELECT doc_id, s FROM sh WHERE doc_id % {EVAL_MOD} <> 0),
        ev AS (SELECT doc_id AS eval_id, s FROM sh
               WHERE doc_id % {EVAL_MOD} = 0)
        SELECT t.doc_id,
               CAST(count(DISTINCT t.s) AS BIGINT) AS n_shared_grams,
               CAST(count(DISTINCT e.eval_id) AS BIGINT) AS n_eval_docs
        FROM train t JOIN ev e USING (s)
        GROUP BY t.doc_id
    """

    from ..operators.curation import DECONTAM_SWEEP_KS, PREFIX_TOKENS

    # width-sensitivity sweep: one width-tagged gram stream, the same
    # eval-side join per width, explicit zero rows for clean widths
    def _k_grams(k: int) -> str:
        return (
            f"SELECT CAST({k} AS INT) AS gram_k, doc_id, s FROM ("
            f"SELECT doc_id, unnest(list_transform("
            f"range(1, greatest(len(t) - {k - 1}, 0) + 1), "
            f"i -> array_to_string(t[i:i + {k - 1}], ' '))) AS s "
            f"FROM toks) u{k} GROUP BY 1, 2, 3"
        )

    _sweep_union = " UNION ALL ".join(_k_grams(k) for k in DECONTAM_SWEEP_KS)
    _sweep_vals = ", ".join(
        f"(CAST({k} AS INT))" for k in DECONTAM_SWEEP_KS
    )
    o["decontaminate_ngram_sweep"] = f"""
        WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
        grams AS ({_sweep_union}),
        hits AS (
          SELECT tr.gram_k, tr.doc_id, ev.doc_id AS eval_id, tr.s
          FROM grams tr
          JOIN grams ev ON ev.gram_k = tr.gram_k AND ev.s = tr.s
          WHERE tr.doc_id % {EVAL_MOD} <> 0
            AND ev.doc_id % {EVAL_MOD} = 0
        ),
        agg AS (
          SELECT gram_k,
                 CAST(count(DISTINCT doc_id) AS BIGINT) AS flagged,
                 CAST(count(DISTINCT eval_id) AS BIGINT) AS hit,
                 CAST(count(DISTINCT s) AS BIGINT) AS shared
          FROM hits GROUP BY gram_k
        )
        SELECT k.gram_k,
               CAST(coalesce(flagged, 0) AS BIGINT) AS n_train_flagged,
               CAST(coalesce(hit, 0) AS BIGINT) AS n_eval_docs_hit,
               CAST(coalesce(shared, 0) AS BIGINT) AS n_shared_grams
        FROM (VALUES {_sweep_vals}) k(gram_k)
        LEFT JOIN agg USING (gram_k)
    """

    # shared-prefix boilerplate census: first-P-token key, >= 2 copies
    o["doc_prefix_boilerplate"] = f"""
        WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
        p AS (
          SELECT doc_id,
                 array_to_string(t[1:{PREFIX_TOKENS}], ' ') AS prefix
          FROM toks
        )
        SELECT prefix,
               CAST(count(*) AS BIGINT) AS n_docs,
               min(doc_id) AS exemplar_id
        FROM p WHERE prefix <> ''
        GROUP BY prefix HAVING count(*) >= 2
    """

    from ..operators.textops import HH_BLOCK_DOCS, HH_CAP, HH_TOP_K

    # mergeable heavy-hitter summary: per-block top-C counters +
    # dropped-max; lb = kept sums, ub adds the dropped-max of every
    # block whose summary omitted the token
    o["vocab_top_tokens_mergeable"] = f"""
        WITH btoks AS (
          SELECT doc_id // {HH_BLOCK_DOCS} AS block_id,
                 unnest({TOKS}) AS t
          FROM documents
        ),
        counts AS (
          SELECT block_id, t, CAST(count(*) AS BIGINT) AS c
          FROM btoks GROUP BY 1, 2
        ),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY block_id
                    ORDER BY c DESC, t) AS rk
          FROM counts
        ),
        kept AS (SELECT block_id, t, c FROM ranked WHERE rk <= {HH_CAP}),
        dmax AS (
          SELECT b.block_id, COALESCE(d.dmax, 0) AS dmax
          FROM (SELECT DISTINCT block_id FROM counts) b
          LEFT JOIN (SELECT block_id, max(c) AS dmax FROM ranked
                     WHERE rk > {HH_CAP} GROUP BY block_id) d
            USING (block_id)
        ),
        tot AS (SELECT CAST(sum(dmax) AS BIGINT) AS s_dmax FROM dmax),
        per_t AS (
          SELECT k.t, CAST(sum(k.c) AS BIGINT) AS lb,
                 CAST(sum(m.dmax) AS BIGINT) AS present_dmax
          FROM kept k JOIN dmax m USING (block_id) GROUP BY k.t
        )
        SELECT t, lb, lb + s_dmax - present_dmax AS ub,
               CAST(rn AS INT) AS rn
        FROM (
          SELECT p.*, tot.s_dmax,
                 row_number() OVER (ORDER BY lb DESC, t) AS rn
          FROM per_t p CROSS JOIN tot
        ) x
        WHERE rn <= {HH_TOP_K}
    """

    from ..operators.textops import BPE_N_MERGES

    # BPE merge training replayed round by round: pair counts from
    # zipped unnests, the argmax pair as a 1-row CTE, and the greedy
    # left-to-right fuse as a per-doc RECURSIVE fold — the same fold
    # semantics as the Spark side's aggregate() lambda (overlapping
    # occurrences resolve left-to-right because the fold state is the
    # already-merged output array).
    bpe = ["d0 AS MATERIALIZED (SELECT doc_id, " + TOKS + " AS t FROM documents)"]
    for n in range(BPE_N_MERGES):
        bpe.append(f"""pc{n} AS MATERIALIZED (
          SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM (
            SELECT unnest(t[1:len(t) - 1]) AS a,
                   unnest(t[2:len(t)]) AS b
            FROM d{n} WHERE len(t) >= 2) u
          GROUP BY a, b)""")
        bpe.append(f"""m{n} AS MATERIALIZED (
          SELECT {n} AS rnd, a AS lft, b AS rgt, c FROM pc{n}
          ORDER BY c DESC, a, b LIMIT 1)""")
        bpe.append(f"""r{n} AS (
          SELECT doc_id, 0 AS i, CAST([] AS VARCHAR[]) AS out FROM d{n}
          UNION ALL
          SELECT m.doc_id, m.i + 1,
                 CASE WHEN len(m.out) > 0
                           AND m.out[len(m.out)] = (SELECT lft FROM m{n})
                           AND d.t[m.i + 1] = (SELECT rgt FROM m{n})
                      THEN m.out[1:len(m.out) - 1]
                           || [(SELECT lft FROM m{n}) || ' '
                               || (SELECT rgt FROM m{n})]
                      ELSE m.out || [d.t[m.i + 1]] END
          FROM r{n} m JOIN d{n} d USING (doc_id)
          WHERE m.i < len(d.t))""")
        bpe.append(f"""d{n + 1} AS MATERIALIZED (
          SELECT r.doc_id, r.out AS t FROM r{n} r JOIN d{n} d USING (doc_id)
          WHERE r.i = len(d.t))""")
    merge_union = " UNION ALL ".join(
        f"SELECT rnd, lft, rgt, c FROM m{n}" for n in range(BPE_N_MERGES)
    )
    bpe_chain = "WITH RECURSIVE " + ",\n".join(bpe)
    o["bpe_train_merges"] = (
        bpe_chain
        + f"""
        SELECT CAST(rnd AS INT) AS round, lft AS "left",
               rgt AS "right", c AS n_pairs
        FROM ({merge_union}) t
    """
    )
    # encode = the final symbol table of the SAME chain; compression
    # divides exact integer lengths (IEEE-identical both engines)
    o["bpe_encode"] = (
        bpe_chain
        + f"""
        SELECT z.doc_id,
               CAST(len(d0.t) AS BIGINT) AS n_raw_tokens,
               CAST(len(z.t) AS BIGINT) AS n_bpe_symbols,
               CASE WHEN len(d0.t) > 0
                    THEN CAST(len(z.t) AS BIGINT)
                         / CAST(len(d0.t) AS BIGINT)
                    ELSE 1.0 END AS compression
        FROM d{BPE_N_MERGES} z JOIN d0 USING (doc_id)
    """
    )

    # fertility = the same encode chain rolled up by language;
    # floor-div permille keeps the ratio integer-exact
    o["tokenizer_fertility_eval"] = (
        bpe_chain
        + f"""
        SELECT doc.lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(d0.t)) AS BIGINT) AS n_raw_tokens,
               CAST(sum(len(z.t)) AS BIGINT) AS n_bpe_symbols,
               CAST(CASE WHEN sum(len(d0.t)) = 0 THEN 0 ELSE
                    1000 * CAST(sum(len(z.t)) AS BIGINT)
                    // CAST(sum(len(d0.t)) AS BIGINT) END AS BIGINT)
                 AS fertility_permille
        FROM d{BPE_N_MERGES} z
        JOIN d0 USING (doc_id)
        JOIN documents doc USING (doc_id)
        GROUP BY doc.lang
    """
    )

    from ..operators.curation import BLOOM_K, BLOOM_POS_HEX

    # Bloom positions ARE 4-hex md5 prefixes — string equality is the
    # membership test, so the deterministic false-positive behavior
    # itself hash-checks across engines
    o["decontaminate_bloom"] = f"""
        WITH {_shingle_cte(DECONTAM_K)},
        js AS (SELECT unnest(range(0, {BLOOM_K})) AS j),
        train AS (SELECT doc_id, s FROM sh WHERE doc_id % {EVAL_MOD} <> 0),
        ev AS (SELECT s FROM sh WHERE doc_id % {EVAL_MOD} = 0),
        bits AS (
          SELECT DISTINCT substr(md5('b' || CAST(j AS VARCHAR) || ':' || s),
                                 1, {BLOOM_POS_HEX}) AS p
          FROM ev CROSS JOIN js
        ),
        tpos AS (
          SELECT doc_id, s,
                 substr(md5('b' || CAST(j AS VARCHAR) || ':' || s),
                        1, {BLOOM_POS_HEX}) AS p
          FROM train CROSS JOIN js
        ),
        hits AS (
          SELECT doc_id, s FROM tpos JOIN bits USING (p)
          GROUP BY doc_id, s HAVING count(*) = {BLOOM_K}
        ),
        bloom AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bloom_grams
          FROM hits GROUP BY doc_id
        ),
        ex AS (
          SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_exact_grams
          FROM train t JOIN (SELECT DISTINCT s FROM ev) e USING (s)
          GROUP BY t.doc_id
        )
        SELECT b.doc_id, b.n_bloom_grams,
               COALESCE(ex.n_exact_grams, 0) AS n_exact_grams,
               COALESCE(ex.n_exact_grams, 0) > 0 AS contaminated
        FROM bloom b LEFT JOIN ex USING (doc_id)
    """

    rate_case = (
        "CASE lang "
        + " ".join(f"WHEN '{lg}' THEN '{r}'" for lg, r in SAMPLE_RATES.items())
        + f" ELSE '{SAMPLE_DEFAULT_RATE}' END"
    )
    o["corpus_sample"] = f"""
        SELECT doc_id, lang FROM documents
        WHERE substr(md5('{SAMPLE_SALT}' || doc_id), 1, 4) < {rate_case}
    """

    split_whens = " ".join(
        f"WHEN substr(md5('{SPLIT_SALT}' || doc_id), 1, 4) < '{bound}' "
        f"THEN '{name}'"
        for name, bound in SPLIT_BOUNDS
    )
    from ..operators.curation import (
        RESAMPLE_DEFAULT,
        RESAMPLE_SALT,
        RESAMPLE_WEIGHTS,
    )

    whole_case = (
        "CASE source "
        + " ".join(
            f"WHEN '{s}' THEN {wh}" for s, (wh, _) in RESAMPLE_WEIGHTS.items()
        )
        + f" ELSE {RESAMPLE_DEFAULT[0]} END"
    )
    frac_case = (
        "CASE source "
        + " ".join(
            f"WHEN '{s}' THEN '{fr}'" for s, (_, fr) in RESAMPLE_WEIGHTS.items()
        )
        + f" ELSE '{RESAMPLE_DEFAULT[1]}' END"
    )
    o["importance_resample"] = f"""
        SELECT doc_id, source, n_copies,
               CAST(unnest(range(0, n_copies)) AS INT) AS copy_id
        FROM (
          SELECT doc_id, source,
                 CAST({whole_case}
                      + CASE WHEN substr(md5('{RESAMPLE_SALT}' || doc_id), 1, 4)
                                  < {frac_case}
                             THEN 1 ELSE 0 END AS INT) AS n_copies
          FROM documents
        ) t
        WHERE n_copies > 0
    """

    o["train_test_split"] = f"""
        SELECT doc_id, lang,
               CASE {split_whens} ELSE '{SPLIT_LAST}' END AS split
        FROM documents
    """

    from ..operators.curation import SHUFFLE_N_SHARDS, SHUFFLE_SALT

    # The oracle states the semantics as the naive single global
    # window; the Spark side's two-stage (block offsets + in-block
    # rank) numbering must land on the identical permutation.
    o["corpus_shuffle"] = f"""
        WITH keyed AS (
          SELECT doc_id, md5('{SHUFFLE_SALT}' || doc_id) AS shuffle_key
          FROM documents
        ),
        ranked AS (
          SELECT doc_id, shuffle_key,
                 CAST(row_number() OVER (ORDER BY shuffle_key, doc_id)
                      AS BIGINT) AS pos,
                 CAST(count(*) OVER () AS BIGINT) AS total
          FROM keyed
        )
        SELECT doc_id, shuffle_key, pos,
               CAST(((pos - 1) * {SHUFFLE_N_SHARDS}) // total AS INT)
                 AS shard
        FROM ranked
    """

    # shard balance: shard ids re-derived, per-mille shares as
    # single integer divisions
    o["shard_balance_report"] = f"""
        WITH keyed AS (
          SELECT doc_id, md5('{SHUFFLE_SALT}' || doc_id) AS shuffle_key
          FROM documents
        ),
        ranked AS (
          SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY shuffle_key, doc_id)
                      AS BIGINT) AS pos,
                 CAST(count(*) OVER () AS BIGINT) AS total
          FROM keyed
        ),
        per AS (
          SELECT CAST(((pos - 1) * {SHUFFLE_N_SHARDS}) // total AS INT)
                   AS shard,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(length(d.text)) AS BIGINT) AS n_bytes
          FROM ranked r JOIN documents d USING (doc_id)
          GROUP BY 1
        )
        SELECT shard, n_docs, n_bytes,
               round(1000 * n_docs / (SELECT sum(n_docs) FROM per), 4)
                 AS count_share_pm,
               round(1000 * n_bytes / (SELECT sum(n_bytes) FROM per), 4)
                 AS bytes_share_pm
        FROM per
    """

    # rollup over the gzip-JSONL ROUND TRIP: recomputed straight from
    # the source tables, so any escaping/row corruption in the export
    # (or a wrong shard assignment) hash-mismatches
    o["jsonl_shard_export"] = f"""
        WITH keyed AS (
          SELECT doc_id, md5('{SHUFFLE_SALT}' || doc_id) AS shuffle_key
          FROM documents
        ),
        ranked AS (
          SELECT doc_id,
                 row_number() OVER (ORDER BY shuffle_key, doc_id) AS pos,
                 count(*) OVER () AS total
          FROM keyed
        )
        SELECT CAST(((pos - 1) * {SHUFFLE_N_SHARDS}) // total AS INT)
                 AS shard,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(length(text)) AS BIGINT) AS sum_chars,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        FROM ranked JOIN documents USING (doc_id)
        GROUP BY 1
    """

    from ..operators.textops import QC_MOD, QC_SHIFT

    # Mirrors operators/textops.quality_classifier: identical integer
    # weight expression from the same md5 hex chars.
    o["quality_classifier"] = f"""
        WITH tok AS (
          SELECT doc_id, unnest({TOKS}) AS t FROM documents
        ), w AS (
          SELECT doc_id,
                 (ascii(substr(md5(t), 1, 1)) * 7
                  + ascii(substr(md5(t), 2, 1)) * 13
                  + ascii(substr(md5(t), 3, 1)) * 3
                  + ascii(substr(md5(t), 4, 1)) * 31)
                   % {QC_MOD} - {QC_SHIFT} AS w
          FROM tok
        ), s AS (
          SELECT doc_id, CAST(sum(w) AS BIGINT) AS score,
                 CAST(count(*) AS BIGINT) AS n_tokens
          FROM w GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(s.n_tokens, 0) AS n_tokens,
               COALESCE(s.score, 0) AS score,
               COALESCE(s.score, 0) > 0 AS keep
        FROM documents d LEFT JOIN s USING (doc_id)
    """

    # Mirrors operators/curation.domain_mixture: exact integer counts,
    # single division at the end in both engines.
    # the release manifest composes four independently-graded stage
    # rules verbatim — the oracle nests their SQL, so a drift in ANY
    # stage's composed behavior hash-mismatches here even if each
    # standalone query stays green
    _mrate = "CASE " + " ".join(
        f"WHEN d.lang = '{lg}' THEN '{rt}'"
        for lg, rt in SAMPLE_RATES.items()
    ) + f" ELSE '{SAMPLE_DEFAULT_RATE}' END"
    o["corpus_release_manifest"] = f"""
        WITH q AS ({o['quality_score']}),
        k AS ({o['dedup_exact']}),
        contam AS (SELECT DISTINCT doc_id FROM ({o['decontaminate']}) dd),
        f AS (
          SELECT d.doc_id, CAST(q.n_tokens AS BIGINT) AS n_tokens,
                 CASE WHEN q.quality >= {QUALITY_MIN}
                       AND q.n_tokens BETWEEN {TOKENS_MIN}
                           AND {TOKENS_MAX}
                      THEN 1 ELSE 0 END AS g,
                 CASE WHEN k.keeper_id IS NOT NULL THEN 1 ELSE 0 END
                   AS kp,
                 CASE WHEN d.doc_id % {EVAL_MOD} <> 0
                       AND c.doc_id IS NULL THEN 1 ELSE 0 END AS cl,
                 CASE WHEN substr(md5('{SAMPLE_SALT}' || d.doc_id), 1, 4)
                      < {_mrate} THEN 1 ELSE 0 END AS sm
          FROM documents d
          JOIN q USING (doc_id)
          LEFT JOIN k ON k.keeper_id = d.doc_id
          LEFT JOIN contam c ON c.doc_id = d.doc_id
        )
        SELECT '0_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM f
        UNION ALL
        SELECT '1_gated', CAST(sum(g) AS BIGINT),
               CAST(sum(g * n_tokens) AS BIGINT) FROM f
        UNION ALL
        SELECT '2_deduped', CAST(sum(g * kp) AS BIGINT),
               CAST(sum(g * kp * n_tokens) AS BIGINT) FROM f
        UNION ALL
        SELECT '3_decontaminated', CAST(sum(g * kp * cl) AS BIGINT),
               CAST(sum(g * kp * cl * n_tokens) AS BIGINT) FROM f
        UNION ALL
        SELECT '4_sampled', CAST(sum(g * kp * cl * sm) AS BIGINT),
               CAST(sum(g * kp * cl * sm * n_tokens) AS BIGINT) FROM f
    """

    # priority sampling: identical u/w double division (both engines
    # divide BIGINT by BIGINT into IEEE doubles), rank over the full
    # order — grading that TakeOrdered's partition-merged bottom-K
    # equals the naive global sort
    from ..operators.curation import PRIORITY_SALT, PRIORITY_SAMPLE_K

    o["priority_sample"] = f"""
        WITH d AS (
          SELECT doc_id, source,
                 CAST(len({TOKS}) AS BIGINT) AS n_tokens,
                 CAST(('0x' || substr(md5('{PRIORITY_SALT}'
                      || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS u
          FROM documents
        )
        SELECT doc_id, source, n_tokens, priority, CAST(rn AS INT) AS rn
        FROM (
          SELECT doc_id, source, n_tokens,
                 u / (n_tokens + 1) AS priority,
                 row_number() OVER (ORDER BY u / (n_tokens + 1), doc_id)
                   AS rn
          FROM d
        ) t WHERE rn <= {PRIORITY_SAMPLE_K}
    """

    # the cross-batch bottom-K fold must land the batch sampler's
    # exact rows and ranks — shared oracle IS the mergeability proof
    o["streaming_priority_sample"] = o["priority_sample"]

    # greedy token-budget fill stated as the NAIVE per-source window
    # (one cumsum over the full hash order) — grading that the Spark
    # side's two-stage block decomposition changes nothing
    from ..operators.curation import MIXTURE_BUDGET_DEN, MIXTURE_SALT

    o["mixture_token_budget"] = f"""
        WITH d AS (
          SELECT source, doc_id, CAST(len({TOKS}) AS BIGINT) AS n_tok,
                 substr(md5('{MIXTURE_SALT}' || CAST(doc_id AS VARCHAR)),
                        1, 8) AS hh
          FROM documents
        ),
        tot AS (
          SELECT CAST(sum(n_tok) // ({MIXTURE_BUDGET_DEN}
                      * count(DISTINCT source)) AS BIGINT) AS budget_tokens
          FROM d
        ),
        cum AS (
          SELECT *, sum(n_tok) OVER (PARTITION BY source
                     ORDER BY hh, doc_id ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW) - n_tok AS cum_before
          FROM d
        )
        SELECT c.source, t.budget_tokens,
               CAST(count(*) AS BIGINT) AS n_docs_sel,
               CAST(sum(c.n_tok) AS BIGINT) AS tokens_sel,
               CAST(sum(c.doc_id) AS BIGINT) AS sel_doc_id_sum,
               CAST(1000 * sum(c.n_tok) // t.budget_tokens AS BIGINT)
                 AS fill_permille
        FROM cum c, tot t
        WHERE c.cum_before < t.budget_tokens
        GROUP BY c.source, t.budget_tokens
    """

    o["domain_mixture"] = f"""
        WITH per AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(len({TOKS})) AS BIGINT) AS n_tokens
          FROM documents GROUP BY source
        ), tot AS (
          SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                 CAST(count(*) AS BIGINT) AS n_sources
          FROM per
        )
        SELECT source, n_docs, n_tokens,
               n_tokens / total_tokens AS observed_share,
               total_tokens / (n_sources * n_tokens) AS mix_weight
        FROM per CROSS JOIN tot
    """


    from ..streaming.batch_bridge import STREAM_HH_TOP_K

    # Mirrors streaming/batch_bridge.streaming_topk_tokens: graded in
    # the exact regime (vocab << cap), so the merged stream state must
    # equal the batch top-K with the same (count desc, token) order.
    o["streaming_topk_tokens"] = f"""
        WITH tok AS (
          SELECT unnest({TOKS}) AS t FROM documents
        ), c AS (
          SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY t
        )
        SELECT t, c, CAST(rk AS INT) AS rk FROM (
          SELECT t, c, row_number() OVER (ORDER BY c DESC, t) AS rk
          FROM c) r
        WHERE rk <= {STREAM_HH_TOP_K}
    """


    # Mirrors operators/textops.doc_gini_diversity: exact integer
    # sums, single division — bit-identical doubles.
    o["doc_gini_diversity"] = f"""
        WITH tc AS (
          SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c
          FROM (SELECT doc_id, unnest({TOKS}) AS t FROM documents) u
          GROUP BY doc_id, t
        ), per AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                 CAST(count(*) AS BIGINT) AS n_distinct,
                 CAST(sum(c * c) AS BIGINT) AS sum_c2
          FROM tc GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(p.n_tokens, 0) AS n_tokens,
               COALESCE(p.n_distinct, 0) AS n_distinct,
               CASE WHEN p.n_tokens > 0
                    THEN (p.n_tokens * p.n_tokens - p.sum_c2)
                         / (p.n_tokens * p.n_tokens)
                    ELSE 0.0 END AS gini_diversity
        FROM documents d LEFT JOIN per p USING (doc_id)
    """


    from ..operators.textops import COLLOC_MIN_COUNT, COLLOC_TOP_K

    # Mirrors operators/textops.bigram_lift_collocations: same integer
    # products, single division — lift doubles bit-identical.
    o["bigram_lift_collocations"] = f"""
        WITH toks AS (
          SELECT doc_id, {TOKS} AS t FROM documents
        ), bi AS (
          SELECT t[i] AS a, t[i + 1] AS b
          FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks) u
        ), bic AS (
          SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
          FROM bi GROUP BY a, b
        ), uni AS (
          SELECT t2 AS t, CAST(count(*) AS BIGINT) AS c_t
          FROM (SELECT unnest(t) AS t2 FROM toks) u GROUP BY t2
        ), tot AS (
          SELECT CAST(sum(c_t) AS BIGINT) AS n FROM uni
        ), scored AS (
          SELECT bic.a, bic.b, bic.c_ab,
                 ua.c_t AS c_a, ub.c_t AS c_b,
                 (tot.n * bic.c_ab) / (ua.c_t * ub.c_t) AS lift
          FROM bic
          JOIN uni ua ON ua.t = bic.a
          JOIN uni ub ON ub.t = bic.b
          CROSS JOIN tot
          WHERE bic.c_ab >= {COLLOC_MIN_COUNT}
        )
        SELECT a, b, c_ab, c_a, c_b, lift, CAST(rk AS INT) AS rk FROM (
          SELECT *, row_number() OVER (ORDER BY lift DESC, a, b) AS rk
          FROM scored) r
        WHERE rk <= {COLLOC_TOP_K}
    """

    # novelty decay: the same distinct-gram / first-occurrence rollup
    # restated over 1-based list slicing; per-mille is positive //
    from ..operators.textops import NOVELTY_BUCKET_DOCS

    o["ngram_novelty_decay"] = f"""
        WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
        g AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(
                   range(1, greatest(len(t) - {REPEAT_K - 1}, 0) + 1),
                   i -> array_to_string(t[i:i + {REPEAT_K - 1}], ' ')))
                   AS gram
          FROM toks
        ),
        f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram)
        SELECT CAST(doc_id // {NOVELTY_BUCKET_DOCS} AS BIGINT) AS batch,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               CAST(1000 * sum(CASE WHEN first_doc = doc_id THEN 1
                               ELSE 0 END) // count(*) AS BIGINT)
                 AS novel_permille
        FROM g JOIN f USING (gram)
        GROUP BY 1
    """

    # AMS F2: the sign hash is the parity of md5(token:r)'s first hex
    # digit — identical md5 on both engines, so every counter S_r and
    # every estimate S_r² must match bit for bit. Sums cast to BIGINT
    # (DuckDB sum() returns HUGEINT, which floats through pandas).
    from ..operators.textops import AMS_R as _AMSR

    o["token_f2_ams"] = f"""
        WITH tok AS (
          SELECT unnest({TOKS}) AS token FROM documents
        ),
        cnt AS (
          SELECT token, CAST(count(*) AS BIGINT) AS cnt
          FROM tok GROUP BY token
        ),
        f2 AS (
          SELECT CAST(sum(cnt * cnt) AS BIGINT) AS f2_exact FROM cnt
        ),
        per_r AS (
          SELECT CAST(r AS BIGINT) AS r,
                 CAST(sum(cnt * CASE WHEN substr(
                        md5(token || ':' || CAST(r AS VARCHAR)), 1, 1)
                        IN ('0','2','4','6','8','a','c','e')
                      THEN 1 ELSE -1 END) AS BIGINT) AS s_r
          FROM cnt CROSS JOIN
               (SELECT unnest(range(0, {_AMSR})) AS r)
          GROUP BY 1
        )
        SELECT r, s_r, s_r * s_r AS est_r, f2_exact
        FROM per_r CROSS JOIN f2
    """
    # the streaming AMS fold must land the batch sketch's exact
    # counters — same oracle, crossed micro-batch boundaries
    o["streaming_f2_ams"] = o["token_f2_ams"]

    # Gopher rule battery: every ratio is an int/int division on
    # identical integers — no rounding, no libm (see operator note)
    from ..operators.textops import (
        GOPHER_ALPHA_REGEX,
        GOPHER_MAX_TOKENS,
        GOPHER_MEAN_WORD_LEN_MAX,
        GOPHER_MEAN_WORD_LEN_MIN,
        GOPHER_MIN_ALPHA_RATIO,
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_TOKENS,
        GOPHER_STOPWORDS,
        GOPHER_SYMBOL_RATIO_MAX,
        GOPHER_SYMBOL_REGEX,
    )

    _gstop = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    o["gopher_quality_flags"] = f"""
        WITH t AS (
          SELECT doc_id, text, {TOKS} AS tk FROM documents
        ),
        feat AS (
          SELECT doc_id,
                 CAST(len(tk) AS INT) AS n_tokens,
                 list_sum(list_transform(tk, s -> length(s)))
                   / len(tk) AS mean_word_len,
                 len(list_filter(tk,
                     s -> regexp_matches(s, '{GOPHER_ALPHA_REGEX}')))
                   / len(tk) AS alpha_ratio,
                 len(regexp_extract_all(text, '{GOPHER_SYMBOL_REGEX}'))
                   / len(tk) AS symbol_ratio,
                 CAST(len(list_intersect(list_distinct(tk),
                      [{_gstop}])) AS INT) AS n_gopher_stopwords
          FROM t
        )
        SELECT doc_id, n_tokens, mean_word_len, alpha_ratio,
               symbol_ratio, n_gopher_stopwords,
               n_tokens >= {GOPHER_MIN_TOKENS}
                 AND n_tokens <= {GOPHER_MAX_TOKENS} AS ok_tokens,
               mean_word_len >= {GOPHER_MEAN_WORD_LEN_MIN}
                 AND mean_word_len <= {GOPHER_MEAN_WORD_LEN_MAX}
                 AS ok_word_len,
               symbol_ratio <= {GOPHER_SYMBOL_RATIO_MAX} AS ok_symbols,
               alpha_ratio >= {GOPHER_MIN_ALPHA_RATIO} AS ok_alpha,
               n_gopher_stopwords >= {GOPHER_MIN_STOPWORDS}
                 AS ok_stopwords,
               (n_tokens >= {GOPHER_MIN_TOKENS}
                 AND n_tokens <= {GOPHER_MAX_TOKENS})
                 AND (mean_word_len >= {GOPHER_MEAN_WORD_LEN_MIN}
                      AND mean_word_len <= {GOPHER_MEAN_WORD_LEN_MAX})
                 AND symbol_ratio <= {GOPHER_SYMBOL_RATIO_MAX}
                 AND alpha_ratio >= {GOPHER_MIN_ALPHA_RATIO}
                 AND n_gopher_stopwords >= {GOPHER_MIN_STOPWORDS}
                 AS kept
        FROM feat
    """

    # the census stacks conditional counts over the same feature CTE
    # the battery grades — composition, not re-derivation
    _rules = {
        "ok_tokens": f"NOT (n_tokens >= {GOPHER_MIN_TOKENS} "
                     f"AND n_tokens <= {GOPHER_MAX_TOKENS})",
        "ok_word_len": f"NOT (mean_word_len >= {GOPHER_MEAN_WORD_LEN_MIN} "
                       f"AND mean_word_len <= {GOPHER_MEAN_WORD_LEN_MAX})",
        "ok_symbols": f"symbol_ratio > {GOPHER_SYMBOL_RATIO_MAX}",
        "ok_alpha": f"alpha_ratio < {GOPHER_MIN_ALPHA_RATIO}",
        "ok_stopwords": f"n_gopher_stopwords < {GOPHER_MIN_STOPWORDS}",
        "all": "NOT kept",
    }
    _census_parts = " UNION ALL ".join(
        f"""
        SELECT '{rule}' AS rule,
               CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_fail,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM f"""
        for rule, cond in _rules.items()
    )
    o["gopher_rule_census"] = f"""
        WITH f AS ({o['gopher_quality_flags']})
        SELECT rule, n_fail, n_docs,
               CAST(floor(1000 * n_fail / n_docs) AS BIGINT)
                 AS fail_permille
        FROM ({_census_parts}) u
    """

    return o


def similarity_oracles() -> dict[str, str]:
    from ..operators.similarity import (
        SEM_DECONTAM_MIN_SIM,
        SEM_EVAL_CAP,
        SEM_EVAL_MOD,
    )

    o: dict[str, str] = {}
    # semantic decontamination: brute eval×train re-derivation with
    # the identical rounded-cosine and smallest-id tie rule; the
    # eval side carries the same fixed-benchmark cap as the engine
    o["decontaminate_semantic"] = f"""
        WITH emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings
        ),
        ev AS (
          SELECT vec_id AS eval_id, v AS qv FROM emb
          WHERE vec_id % {SEM_EVAL_MOD} = 0
            AND vec_id < {SEM_EVAL_MOD * SEM_EVAL_CAP}
        ),
        pairs AS (
          SELECT t.vec_id, e.eval_id,
                 round(list_dot_product(e.qv, t.v)
                       / (sqrt(list_dot_product(e.qv, e.qv))
                          * sqrt(list_dot_product(t.v, t.v))), 3) AS sim
          FROM emb t, ev e
          WHERE NOT (t.vec_id % {SEM_EVAL_MOD} = 0
                     AND t.vec_id < {SEM_EVAL_MOD * SEM_EVAL_CAP})
        ),
        flagged AS (
          SELECT vec_id, eval_id, sim,
                 max(sim) OVER (PARTITION BY vec_id) AS mx
          FROM pairs WHERE sim >= {SEM_DECONTAM_MIN_SIM}
        )
        SELECT vec_id,
               CAST(count(*) AS BIGINT) AS n_eval_near,
               max(sim) AS best_sim,
               min(CASE WHEN sim = mx THEN eval_id END) AS best_eval_id
        FROM flagged GROUP BY 1
    """
    o["knn_cosine_brute"] = f"""
        WITH emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        pairs AS (
          SELECT q.vec_id AS q_id, e.vec_id,
                 round(list_dot_product(q.v, e.v)
                       / (sqrt(list_dot_product(q.v, q.v))
                          * sqrt(list_dot_product(e.v, e.v))), 3) AS sim
          FROM emb e, emb q
          WHERE q.vec_id < {KNN_N_QUERIES} AND e.vec_id != q.vec_id
        )
        SELECT q_id, vec_id, sim, CAST(rn AS INT) AS rn FROM (
          SELECT *, row_number() OVER (PARTITION BY q_id
                    ORDER BY sim DESC, vec_id) AS rn
          FROM pairs
        ) t WHERE rn <= {KNN_TOP_K}
    """

    # hybrid RRF: both component rankings re-derived independently
    # (dense = the knn oracle's shape, sparse = token-set overlap),
    # fused with the identical integer floor-division arithmetic
    from ..operators.similarity import RRF_K, RRF_SCALE

    o["hybrid_rrf_search"] = f"""
        WITH emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        dpairs AS (
          SELECT q.vec_id AS q_id, e.vec_id AS doc_id,
                 round(list_dot_product(q.v, e.v)
                       / (sqrt(list_dot_product(q.v, q.v))
                          * sqrt(list_dot_product(e.v, e.v))), 3) AS sim
          FROM emb e, emb q
          WHERE q.vec_id < {KNN_N_QUERIES} AND e.vec_id != q.vec_id
        ),
        drank AS (
          SELECT q_id, doc_id, rn FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id
                      ORDER BY sim DESC, doc_id) AS rn
            FROM dpairs
          ) t WHERE rn <= {KNN_TOP_K}
        ),
        tk AS (
          SELECT doc_id, list_distinct({TOKS}) AS tk FROM documents
        ),
        sp AS (
          SELECT q.doc_id AS q_id, d.doc_id,
                 len(list_intersect(d.tk, q.tk)) AS ov
          FROM tk d, tk q
          WHERE q.doc_id < {KNN_N_QUERIES} AND d.doc_id != q.doc_id
        ),
        srank AS (
          SELECT q_id, doc_id, rn FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id
                      ORDER BY ov DESC, doc_id) AS rn
            FROM sp WHERE ov > 0
          ) t WHERE rn <= {KNN_TOP_K}
        ),
        fused AS (
          SELECT coalesce(d.q_id, s.q_id) AS q_id,
                 coalesce(d.doc_id, s.doc_id) AS doc_id,
                 CAST(coalesce({RRF_SCALE} // ({RRF_K} + d.rn), 0)
                      + coalesce({RRF_SCALE} // ({RRF_K} + s.rn), 0)
                      AS BIGINT) AS rrf_scaled
          FROM drank d FULL OUTER JOIN srank s
            ON d.q_id = s.q_id AND d.doc_id = s.doc_id
        )
        SELECT q_id, doc_id, rrf_scaled, CAST(rn AS INT) AS rn FROM (
          SELECT *, row_number() OVER (PARTITION BY q_id
                    ORDER BY rrf_scaled DESC, doc_id) AS rn
          FROM fused
        ) t WHERE rn <= {KNN_TOP_K}
    """

    from ..operators.similarity import CONTRASTIVE_SEED

    # contrastive pairs: positives re-derived via the knn oracle
    # shape, negatives by the identical seeded-hash rank
    o["contrastive_pairs"] = f"""
        WITH emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        dpairs AS (
          SELECT q.vec_id AS q_id, e.vec_id AS doc_id,
                 round(list_dot_product(q.v, e.v)
                       / (sqrt(list_dot_product(q.v, q.v))
                          * sqrt(list_dot_product(e.v, e.v))), 3) AS sim
          FROM emb e, emb q
          WHERE q.vec_id < {KNN_N_QUERIES} AND e.vec_id != q.vec_id
        ),
        pos AS (
          SELECT q_id, doc_id FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id
                      ORDER BY sim DESC, doc_id) AS rn
            FROM dpairs
          ) t WHERE rn <= {KNN_TOP_K}
        ),
        cand AS (
          SELECT q.vec_id AS q_id, e.vec_id AS doc_id,
                 md5('{CONTRASTIVE_SEED}:' || q.vec_id || ':'
                     || e.vec_id) AS draw
          FROM emb e, emb q
          WHERE q.vec_id < {KNN_N_QUERIES} AND e.vec_id != q.vec_id
            AND NOT EXISTS (SELECT 1 FROM pos p
                            WHERE p.q_id = q.vec_id
                              AND p.doc_id = e.vec_id)
        ),
        negs AS (
          SELECT q_id, doc_id FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id
                      ORDER BY draw, doc_id) AS nrn
            FROM cand
          ) t WHERE nrn <= {KNN_TOP_K}
        )
        SELECT q_id, doc_id, CAST(1 AS INT) AS label FROM pos
        UNION ALL
        SELECT q_id, doc_id, CAST(0 AS INT) AS label FROM negs
    """

    # MMR unrolled: all four greedy selection rounds restated as
    # chained single-row CTEs with the same (score desc, vec_id)
    # argmax — a divergent pick at ANY round breaks every later row
    from ..operators.similarity import MMR_POOL
    from ..operators.similarity import QUANT_SCALE as _QS

    mmr_quant = f"""
        quant AS (
          SELECT vec_id,
                 list_transform(CAST(embedding AS DOUBLE[]),
                                x -> CAST(floor(x * {_QS}) AS BIGINT))
                   AS q
          FROM embeddings
        ),
        q0 AS (SELECT q FROM quant WHERE vec_id = 0),
        rel AS (
          SELECT e.vec_id, e.q,
                 CAST(list_dot_product(e.q, q0.q) AS BIGINT) AS rel
          FROM quant e, q0 WHERE e.vec_id != 0
        ),
        pool AS (
          SELECT vec_id, q, rel FROM (
            SELECT *, row_number() OVER (ORDER BY rel DESC, vec_id) AS rn
            FROM rel
          ) t WHERE rn <= {MMR_POOL}
        ),
        simf AS (
          SELECT a.vec_id AS va, b.vec_id AS vb,
                 CAST(list_dot_product(a.q, b.q) AS BIGINT) AS s
          FROM pool a JOIN pool b ON a.vec_id != b.vec_id
        )"""
    o["mmr_diversified_search"] = f"""
        WITH {mmr_quant},
        p1 AS (SELECT vec_id, rel, CAST(0 AS BIGINT) AS pen
               FROM pool ORDER BY rel DESC, vec_id LIMIT 1),
        p2 AS (
          SELECT p.vec_id, p.rel, s.s AS pen
          FROM pool p JOIN p1 ON p.vec_id != p1.vec_id
          JOIN simf s ON s.va = p.vec_id AND s.vb = p1.vec_id
          ORDER BY p.rel - s.s DESC, p.vec_id LIMIT 1
        ),
        p3 AS (
          SELECT p.vec_id, p.rel, max(s.s) AS pen
          FROM pool p JOIN simf s ON s.va = p.vec_id
          WHERE p.vec_id NOT IN (SELECT vec_id FROM p1
                                 UNION SELECT vec_id FROM p2)
            AND s.vb IN (SELECT vec_id FROM p1
                         UNION SELECT vec_id FROM p2)
          GROUP BY p.vec_id, p.rel
          ORDER BY p.rel - max(s.s) DESC, p.vec_id LIMIT 1
        ),
        p4 AS (
          SELECT p.vec_id, p.rel, max(s.s) AS pen
          FROM pool p JOIN simf s ON s.va = p.vec_id
          WHERE p.vec_id NOT IN (SELECT vec_id FROM p1
                                 UNION SELECT vec_id FROM p2
                                 UNION SELECT vec_id FROM p3)
            AND s.vb IN (SELECT vec_id FROM p1
                         UNION SELECT vec_id FROM p2
                         UNION SELECT vec_id FROM p3)
          GROUP BY p.vec_id, p.rel
          ORDER BY p.rel - max(s.s) DESC, p.vec_id LIMIT 1
        )
        SELECT CAST(1 AS INT) AS rk, vec_id, rel, pen AS penalty,
               rel - pen AS mmr FROM p1
        UNION ALL SELECT 2, vec_id, rel, pen, rel - pen FROM p2
        UNION ALL SELECT 3, vec_id, rel, pen, rel - pen FROM p3
        UNION ALL SELECT 4, vec_id, rel, pen, rel - pen FROM p4
    """

    from ..operators.similarity import QUANT_SCALE as _QS

    # embedding drift: same quantization + parity split + single
    # exact-integer division
    o["embedding_drift_batches"] = f"""
        WITH q AS (
          SELECT vec_id,
                 list_transform(CAST(embedding AS DOUBLE[]),
                                x -> CAST(floor(x * {_QS}) AS BIGINT))
                   AS qv
          FROM embeddings
        ),
        expl AS (
          SELECT vec_id % 2 = 0 AS batch_a,
                 unnest(generate_series(1, len(qv))) AS dim1,
                 qv
          FROM q
        ),
        per AS (
          SELECT CAST(dim1 - 1 AS INT) AS dim, batch_a,
                 count(*) AS n, sum(qv[dim1]) AS s
          FROM expl GROUP BY 1, 2
        ),
        piv AS (
          SELECT dim,
                 CAST(sum(CASE WHEN batch_a THEN n ELSE 0 END) AS BIGINT) AS na,
                 CAST(sum(CASE WHEN batch_a THEN s ELSE 0 END) AS BIGINT) AS sa,
                 CAST(sum(CASE WHEN batch_a THEN 0 ELSE n END) AS BIGINT) AS nb,
                 CAST(sum(CASE WHEN batch_a THEN 0 ELSE s END) AS BIGINT) AS sb
          FROM per GROUP BY dim
        )
        SELECT dim, na, sa, nb, sb,
               round((sa * nb - sb * na) / (na * nb), 6) AS mean_shift_q
        FROM piv
    """

    from ..operators.similarity import QUANT_SCALE

    o["knn_quantized_int8"] = f"""
        WITH quant AS (
          SELECT vec_id,
                 list_transform(CAST(embedding AS DOUBLE[]),
                                x -> CAST(floor(x * {QUANT_SCALE}) AS BIGINT))
                   AS q
          FROM embeddings
        ),
        pairs AS (
          SELECT qs.vec_id AS q_id, e.vec_id,
                 CAST(list_dot_product(qs.q, e.q) AS BIGINT) AS qdot
          FROM quant e, quant qs
          WHERE qs.vec_id < {KNN_N_QUERIES} AND e.vec_id != qs.vec_id
        )
        SELECT q_id, vec_id, qdot, CAST(rn AS INT) AS rn FROM (
          SELECT *, row_number() OVER (PARTITION BY q_id
                    ORDER BY qdot DESC, vec_id) AS rn
          FROM pairs
        ) t WHERE rn <= {KNN_TOP_K}
    """

    # filtered search: same int8 arithmetic; pre-filter top-k plus the
    # unfiltered-top-k survivor count per query
    from ..operators.similarity import KNN_FILTER_SOURCES as _KFS

    _kfs = "(" + ", ".join(f"'{s}'" for s in _KFS) + ")"
    o["knn_filtered_int8"] = f"""
        WITH quant AS (
          SELECT vec_id,
                 list_transform(CAST(embedding AS DOUBLE[]),
                                x -> CAST(floor(x * {QUANT_SCALE})
                                          AS BIGINT)) AS q
          FROM embeddings
        ),
        pairs AS (
          SELECT qs.vec_id AS q_id, e.vec_id,
                 d.source IN {_kfs} AS keep,
                 CAST(list_dot_product(qs.q, e.q) AS BIGINT) AS qdot
          FROM quant e
          JOIN documents d ON d.doc_id = e.vec_id, quant qs
          WHERE qs.vec_id < {KNN_N_QUERIES} AND e.vec_id != qs.vec_id
        ),
        unf AS (
          SELECT q_id,
                 CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_postfilter
          FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id
                      ORDER BY qdot DESC, vec_id) AS rn
            FROM pairs
          ) t WHERE rn <= {KNN_TOP_K} GROUP BY q_id
        )
        SELECT q_id, vec_id, qdot, CAST(rn AS INT) AS rn, n_postfilter
        FROM (
          SELECT *, row_number() OVER (PARTITION BY q_id
                    ORDER BY qdot DESC, vec_id) AS rn
          FROM pairs WHERE keep
        ) f JOIN unf USING (q_id)
        WHERE rn <= {KNN_TOP_K}
    """

    planes = lsh_planes()
    bucket_expr = " || ".join(
        "(CASE WHEN list_dot_product(v, ["
        + ", ".join(f"{x:.1f}" for x in plane)
        + "]) >= 0 THEN '1' ELSE '0' END)"
        for plane in planes
    )
    o["dedup_embedding_cosine"] = f"""
        WITH emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        corpus AS (SELECT vec_id, v, {bucket_expr} AS bucket FROM emb)
        SELECT va, vb, sim FROM (
          SELECT a.vec_id AS va, b.vec_id AS vb,
                 round(list_dot_product(a.v, b.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v))), 3) AS sim
          FROM corpus a JOIN corpus b USING (bucket)
          WHERE a.vec_id < b.vec_id
        ) t WHERE sim >= {EMBED_DEDUP_MIN_SIM}
    """

    # multiprobe pair twin: the same buckets probed at Hamming <= 1
    # (one-side probing — XOR symmetry reaches every pair once)
    _mp_flips = ", ".join(
        f"substr(bucket, 1, {i - 1}) || "
        f"(CASE WHEN substr(bucket, {i}, 1) = '1' THEN '0' ELSE '1' "
        f"END) || substr(bucket, {i + 1})"
        for i in range(1, len(planes) + 1)
    )
    o["dedup_embedding_multiprobe"] = f"""
        WITH emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        corpus AS (SELECT vec_id, v, {bucket_expr} AS bucket FROM emb),
        probes AS (
          SELECT vec_id, v,
                 unnest([bucket, {_mp_flips}]) AS bucket
          FROM corpus
        )
        SELECT va, vb, sim FROM (
          SELECT p.vec_id AS va, b.vec_id AS vb,
                 round(list_dot_product(p.v, b.v)
                       / (sqrt(list_dot_product(p.v, p.v))
                          * sqrt(list_dot_product(b.v, b.v))), 3) AS sim
          FROM probes p JOIN corpus b USING (bucket)
          WHERE p.vec_id < b.vec_id
        ) t WHERE sim >= {EMBED_DEDUP_MIN_SIM}
    """

    # calibration histogram over the same bucketed candidates
    o["embedding_sim_histogram"] = f"""
        WITH emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        corpus AS (SELECT vec_id, v, {bucket_expr} AS bucket FROM emb),
        pairs AS (
          SELECT round(list_dot_product(a.v, b.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v))), 3) AS sim
          FROM corpus a JOIN corpus b USING (bucket)
          WHERE a.vec_id < b.vec_id
        )
        SELECT floor(sim * 10) / 10 AS sim_band,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM pairs GROUP BY 1
    """

    # per-label centroid coherence (round 10): parallel unnest zips
    # (dim, code); Σ S_d² accumulates in HUGEINT (Spark side:
    # decimal(38,0)) and both report BIGINT — the KS/MW convention
    from ..operators.similarity import QUANT_SCALE as _CQS

    o["embedding_label_coherence"] = f"""
        WITH q AS (
          SELECT label,
                 list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * {_CQS}) AS BIGINT)) AS qv
          FROM embeddings
        ),
        ex AS (
          SELECT label,
                 unnest(range(1, len(qv) + 1)) AS dim,
                 unnest(qv) AS v
          FROM q
        ),
        per_dim AS (
          SELECT label, dim, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v) AS BIGINT) AS s
          FROM ex GROUP BY label, dim
        ),
        per_label AS (
          SELECT label, CAST(max(n) AS BIGINT) AS n_vecs,
                 CAST(count(*) AS BIGINT) AS n_dims,
                 sum(CAST(s AS HUGEINT) * s) AS ssq
          FROM per_dim GROUP BY label
        )
        SELECT CAST(label AS INT) AS label, n_vecs, n_dims,
               CAST(ssq AS BIGINT) AS ssq,
               CAST((1000000 * ssq)
                    // (CAST(n_vecs AS HUGEINT) * n_vecs
                        * {_CQS * _CQS}) AS BIGINT) AS coherence_ppm
        FROM per_label
    """

    o["doc_embedding_join"] = """
        SELECT d.doc_id, d.lang, d.n_chars, e.label,
               round(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                           CAST(e.embedding AS DOUBLE[]))), 3)
                 AS embedding_norm
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """

    o["ann_ivf_cosine"] = f"""
        WITH emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        nemb AS (
          SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nv FROM emb
        ),
        cent AS (
          SELECT vec_id AS cell, v AS cv, nv AS cn FROM nemb
          WHERE vec_id < {IVF_N_CELLS}
        ),
        scored AS (
          SELECT e.vec_id, e.v, e.nv, c.cell,
                 round(list_dot_product(e.v, c.cv) / (e.nv * c.cn), 3) AS csim
          FROM nemb e CROSS JOIN cent c
        ),
        assign AS (
          SELECT vec_id, v, nv, cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY csim DESC, cell) AS arn
            FROM scored) t
          WHERE arn = 1
        ),
        probe AS (
          SELECT vec_id AS q_id, v AS qv, nv AS qn, cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY csim DESC, cell) AS prn
            FROM scored WHERE vec_id < {ANN_N_QUERIES}) t
          WHERE prn <= {IVF_NPROBE}
        ),
        pairs AS (
          SELECT p.q_id, a.vec_id,
                 round(list_dot_product(p.qv, a.v) / (p.qn * a.nv), 3) AS sim
          FROM probe p JOIN assign a USING (cell)
          WHERE a.vec_id != p.q_id
        )
        SELECT q_id, vec_id, sim, CAST(rn AS INT) AS rn FROM (
          SELECT *, row_number() OVER (PARTITION BY q_id
                    ORDER BY sim DESC, vec_id) AS rn
          FROM pairs
        ) t WHERE rn <= {IVF_TOP_K}
    """
    # the parquet-persisted index must return the exact in-memory
    # results (doubles roundtrip parquet bit-exactly)
    o["ann_ivf_persisted"] = o["ann_ivf_cosine"]
    # append maintenance must land the identical index content as a
    # from-scratch build — shared oracle IS the proof
    o["ann_ivf_append"] = o["ann_ivf_cosine"]

    # tombstone delete: the same IVF pipeline over the SURVIVING
    # corpus — derived from the shared oracle by narrowing the pairs
    # stage (the assert pins the anchor so a template edit can't
    # silently produce an un-narrowed oracle)
    from ..operators.similarity import IVF_DELETE_MOD

    _ivf_pairs_anchor = "WHERE a.vec_id != p.q_id"
    assert _ivf_pairs_anchor in o["ann_ivf_cosine"]
    o["ann_ivf_delete"] = o["ann_ivf_cosine"].replace(
        _ivf_pairs_anchor,
        _ivf_pairs_anchor
        + f" AND a.vec_id % {IVF_DELETE_MOD} != 0",
    )

    # IVF probe-width tuning curve: the same index/probe CTEs with
    # prn retained; each sweep point re-ranks the prn-filtered pairs
    # and recounts hits against the nested brute-force truth
    from ..operators.similarity import IVF_SWEEP_PROBES

    _sweep_max = max(IVF_SWEEP_PROBES)
    _sweep_legs = "\n        UNION ALL\n".join(
        f"""
        SELECT CAST({p} AS INT) AS nprobe, t.n_truth, h.n_hits,
               CAST(CASE WHEN t.n_truth = 0 THEN 0
                    ELSE 1000 * h.n_hits // t.n_truth END AS BIGINT)
                 AS recall_permille,
               c.n_candidates
        FROM truth t
        CROSS JOIN (
          SELECT CAST(count(*) AS BIGINT) AS n_hits
          FROM (
            SELECT q_id, vec_id FROM (
              SELECT q_id, vec_id,
                     row_number() OVER (PARTITION BY q_id
                          ORDER BY sim DESC, vec_id) AS rn
              FROM pairs WHERE prn <= {p}
            ) rr WHERE rn <= {IVF_TOP_K}
          ) rk JOIN brute b USING (q_id, vec_id)
        ) h
        CROSS JOIN (
          SELECT CAST(count(*) AS BIGINT) AS n_candidates
          FROM pairs WHERE prn <= {p}
        ) c"""
        for p in IVF_SWEEP_PROBES
    )
    o["ann_ivf_probe_sweep"] = f"""
        WITH emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        nemb AS (
          SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nv FROM emb
        ),
        cent AS (
          SELECT vec_id AS cell, v AS cv, nv AS cn FROM nemb
          WHERE vec_id < {IVF_N_CELLS}
        ),
        scored AS (
          SELECT e.vec_id, e.v, e.nv, c.cell,
                 round(list_dot_product(e.v, c.cv) / (e.nv * c.cn), 3) AS csim
          FROM nemb e CROSS JOIN cent c
        ),
        assign AS (
          SELECT vec_id, v, nv, cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY csim DESC, cell) AS arn
            FROM scored) t
          WHERE arn = 1
        ),
        probe AS (
          SELECT vec_id AS q_id, v AS qv, nv AS qn, cell, prn FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY csim DESC, cell) AS prn
            FROM scored WHERE vec_id < {ANN_N_QUERIES}) t
          WHERE prn <= {_sweep_max}
        ),
        pairs AS (
          SELECT p.q_id, a.vec_id, p.prn,
                 round(list_dot_product(p.qv, a.v) / (p.qn * a.nv), 3) AS sim
          FROM probe p JOIN assign a USING (cell)
          WHERE a.vec_id != p.q_id
        ),
        brute AS (SELECT q_id, vec_id FROM ({o["knn_cosine_brute"]}) bb),
        truth AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM brute)
        {_sweep_legs}
    """

    # SCALED probe sweep (round 6): identical formulation at the
    # grown quantizer (cells/queries/k where cell sizes matter);
    # truth is an inline brute top-k over the same 100-query panel.
    from ..operators.similarity import (
        IVF_SCALED_CELLS,
        IVF_SCALED_QUERIES,
        IVF_SCALED_TOP_K,
    )

    _ssweep_legs = "\n        UNION ALL\n".join(
        f"""
        SELECT CAST({p} AS INT) AS nprobe, t.n_truth, h.n_hits,
               CAST(CASE WHEN t.n_truth = 0 THEN 0
                    ELSE 1000 * h.n_hits // t.n_truth END AS BIGINT)
                 AS recall_permille,
               c.n_candidates
        FROM truth t
        CROSS JOIN (
          SELECT CAST(count(*) AS BIGINT) AS n_hits
          FROM (
            SELECT q_id, vec_id FROM (
              SELECT q_id, vec_id,
                     row_number() OVER (PARTITION BY q_id
                          ORDER BY sim DESC, vec_id) AS rn
              FROM pairs WHERE prn <= {p}
            ) rr WHERE rn <= {IVF_SCALED_TOP_K}
          ) rk JOIN brute b USING (q_id, vec_id)
        ) h
        CROSS JOIN (
          SELECT CAST(count(*) AS BIGINT) AS n_candidates
          FROM pairs WHERE prn <= {p}
        ) c"""
        for p in IVF_SWEEP_PROBES
    )
    o["ann_ivf_probe_sweep_scaled"] = f"""
        WITH emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        nemb AS (
          SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nv FROM emb
        ),
        cent AS (
          SELECT vec_id AS cell, v AS cv, nv AS cn FROM nemb
          WHERE vec_id < {IVF_SCALED_CELLS}
        ),
        scored AS (
          SELECT e.vec_id, e.v, e.nv, c.cell,
                 round(list_dot_product(e.v, c.cv) / (e.nv * c.cn), 3) AS csim
          FROM nemb e CROSS JOIN cent c
        ),
        assign AS (
          SELECT vec_id, v, nv, cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY csim DESC, cell) AS arn
            FROM scored) t
          WHERE arn = 1
        ),
        probe AS (
          SELECT vec_id AS q_id, v AS qv, nv AS qn, cell, prn FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY csim DESC, cell) AS prn
            FROM scored WHERE vec_id < {IVF_SCALED_QUERIES}) t
          WHERE prn <= {_sweep_max}
        ),
        pairs AS (
          SELECT p.q_id, a.vec_id, p.prn,
                 round(list_dot_product(p.qv, a.v) / (p.qn * a.nv), 3) AS sim
          FROM probe p JOIN assign a USING (cell)
          WHERE a.vec_id != p.q_id
        ),
        brute AS (
          SELECT q_id, vec_id FROM (
            SELECT q.q_id, e.vec_id,
                   row_number() OVER (PARTITION BY q.q_id
                        ORDER BY round(list_dot_product(q.qv, e.v)
                                       / (q.qn * e.nv), 3) DESC,
                        e.vec_id) AS rn
            FROM (SELECT vec_id AS q_id, v AS qv, nv AS qn FROM nemb
                  WHERE vec_id < {IVF_SCALED_QUERIES}) q
            JOIN nemb e ON e.vec_id != q.q_id
          ) bb WHERE rn <= {IVF_SCALED_TOP_K}
        ),
        truth AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM brute)
        {_ssweep_legs}
    """

    from ..operators.similarity import (
        PQ_K,
        PQ_M,
        PQ_SHORTLIST,
        PQ_SUB_DIM,
        PQ_TOP_K,
        QUANT_SCALE as _QS,
    )

    # mirrors operators/similarity.ann_pq_cosine: int8 sub-vectors,
    # exact-integer codeword argmin (c·c − 2 s·c), ADC lookup-table
    # scoring — identical integer arithmetic, no rounding protocol.
    o["ann_pq_cosine"] = f"""
        WITH quant AS (
          SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                 x -> CAST(floor(x * {_QS}) AS BIGINT)) AS q
          FROM embeddings
        ),
        ms AS (SELECT unnest(range(0, {PQ_M})) AS m),
        subs AS (
          SELECT vec_id, m,
                 list_slice(q, m * {PQ_SUB_DIM} + 1,
                            m * {PQ_SUB_DIM} + {PQ_SUB_DIM}) AS sub
          FROM quant CROSS JOIN ms
        ),
        cb AS (
          SELECT m, vec_id AS code, sub AS cw FROM subs
          WHERE vec_id < {PQ_K}
        ),
        enc AS (
          SELECT vec_id, m, code FROM (
            SELECT s.vec_id, s.m, c.code,
                   row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
                     CAST(list_dot_product(c.cw, c.cw) AS BIGINT)
                     - 2 * CAST(list_dot_product(s.sub, c.cw) AS BIGINT)
                     ASC, c.code) AS rn
            FROM subs s JOIN cb c USING (m)) t
          WHERE rn = 1
        ),
        lut AS (
          SELECT s.vec_id AS q_id, c.m, c.code,
                 CAST(list_dot_product(s.sub, c.cw) AS BIGINT) AS contrib
          FROM subs s JOIN cb c USING (m)
          WHERE s.vec_id < {KNN_N_QUERIES}
        ),
        pairs AS (
          SELECT l.q_id, e.vec_id,
                 CAST(sum(l.contrib) AS BIGINT) AS adc
          FROM enc e JOIN lut l ON e.m = l.m AND e.code = l.code
          WHERE e.vec_id != l.q_id
          GROUP BY l.q_id, e.vec_id
        ),
        shortlist AS (
          SELECT q_id, vec_id FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id
                      ORDER BY adc DESC, vec_id) AS srn
            FROM pairs) t
          WHERE srn <= {PQ_SHORTLIST}
        ),
        rer AS (
          SELECT s.q_id, s.vec_id,
                 CAST(list_dot_product(qv.q, cv.q) AS BIGINT) AS qdot
          FROM shortlist s
          JOIN quant cv ON cv.vec_id = s.vec_id
          JOIN quant qv ON qv.vec_id = s.q_id
        )
        SELECT q_id, vec_id, qdot, CAST(rn AS INT) AS rn FROM (
          SELECT *, row_number() OVER (PARTITION BY q_id
                    ORDER BY qdot DESC, vec_id) AS rn
          FROM rer
        ) t WHERE rn <= {PQ_TOP_K}
    """

    from ..operators.similarity import IVFPQ_SHORTLIST

    # IVF-PQ hybrid: the IVF assign/probe CTEs bound WHICH candidates
    # are ADC-scored, the PQ enc/lut CTEs bound the per-candidate
    # cost — composed verbatim from the two component oracles.
    o["ann_ivf_pq_cosine"] = f"""
        WITH emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        nemb AS (
          SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nv FROM emb
        ),
        cent AS (
          SELECT vec_id AS cell, v AS cv, nv AS cn FROM nemb
          WHERE vec_id < {IVF_N_CELLS}
        ),
        cscored AS (
          SELECT e.vec_id, c.cell,
                 round(list_dot_product(e.v, c.cv) / (e.nv * c.cn), 3) AS csim
          FROM nemb e CROSS JOIN cent c
        ),
        assign AS (
          SELECT vec_id, cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY csim DESC, cell) AS arn
            FROM cscored) t
          WHERE arn = 1
        ),
        probe AS (
          SELECT vec_id AS q_id, cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY csim DESC, cell) AS prn
            FROM cscored WHERE vec_id < {ANN_N_QUERIES}) t
          WHERE prn <= {IVF_NPROBE}
        ),
        cand AS (
          SELECT p.q_id, a.vec_id
          FROM probe p JOIN assign a USING (cell)
          WHERE a.vec_id != p.q_id
        ),
        quant AS (
          SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                 x -> CAST(floor(x * {_QS}) AS BIGINT)) AS q
          FROM embeddings
        ),
        ms AS (SELECT unnest(range(0, {PQ_M})) AS m),
        subs AS (
          SELECT vec_id, m,
                 list_slice(q, m * {PQ_SUB_DIM} + 1,
                            m * {PQ_SUB_DIM} + {PQ_SUB_DIM}) AS sub
          FROM quant CROSS JOIN ms
        ),
        cb AS (
          SELECT m, vec_id AS code, sub AS cw FROM subs
          WHERE vec_id < {PQ_K}
        ),
        enc AS (
          SELECT vec_id, m, code FROM (
            SELECT s.vec_id, s.m, c.code,
                   row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
                     CAST(list_dot_product(c.cw, c.cw) AS BIGINT)
                     - 2 * CAST(list_dot_product(s.sub, c.cw) AS BIGINT)
                     ASC, c.code) AS rn
            FROM subs s JOIN cb c USING (m)) t
          WHERE rn = 1
        ),
        lut AS (
          SELECT s.vec_id AS q_id, c.m, c.code,
                 CAST(list_dot_product(s.sub, c.cw) AS BIGINT) AS contrib
          FROM subs s JOIN cb c USING (m)
          WHERE s.vec_id < {ANN_N_QUERIES}
        ),
        pairs AS (
          SELECT cd.q_id, cd.vec_id,
                 CAST(sum(l.contrib) AS BIGINT) AS adc
          FROM cand cd
          JOIN enc e ON e.vec_id = cd.vec_id
          JOIN lut l ON l.q_id = cd.q_id AND l.m = e.m AND l.code = e.code
          GROUP BY cd.q_id, cd.vec_id
        ),
        shortlist AS (
          SELECT q_id, vec_id FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id
                      ORDER BY adc DESC, vec_id) AS srn
            FROM pairs) t
          WHERE srn <= {IVFPQ_SHORTLIST}
        ),
        rer AS (
          SELECT s.q_id, s.vec_id,
                 CAST(list_dot_product(qv.q, cv.q) AS BIGINT) AS qdot
          FROM shortlist s
          JOIN quant cv ON cv.vec_id = s.vec_id
          JOIN quant qv ON qv.vec_id = s.q_id
        )
        SELECT q_id, vec_id, qdot, CAST(rn AS INT) AS rn FROM (
          SELECT *, row_number() OVER (PARTITION BY q_id
                    ORDER BY qdot DESC, vec_id) AS rn
          FROM rer
        ) t WHERE rn <= {PQ_TOP_K}
    """

    from ..operators.similarity import (
        CLUSTER_SAMPLE_SALT,
        CLUSTER_SAMPLE_TARGET,
        KMEANS_ITERS,
        KMEANS_K,
        QUANT_SCALE,
    )

    # Mirrors operators/similarity.kmeans_assignments: KMEANS_ITERS
    # Lloyd iterations unrolled as CTEs. Centroid state is exact
    # integers (component sums + count), distances the same two
    # correctly-rounded divisions as the Spark side — assignments are
    # therefore bit-identical, no rounding protocol. Final CTE ``asg``
    # is (vec_id, cluster), shared by the three clustering oracles.
    km = [
        f"""quant AS (
          SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                 x -> CAST(floor(x * {QUANT_SCALE}) AS BIGINT)) AS q
          FROM embeddings)""",
        f"""cent0 AS (
          SELECT vec_id AS cell, q AS s, CAST(1 AS BIGINT) AS c
          FROM quant WHERE vec_id < {KMEANS_K})""",
    ]
    for it in range(KMEANS_ITERS):
        km.append(f"""assign{it} AS (
          SELECT vec_id, q, cell FROM (
            SELECT v.vec_id, v.q, c.cell,
                   row_number() OVER (PARTITION BY v.vec_id ORDER BY
                     (CAST(list_dot_product(c.s, c.s) AS BIGINT)
                        / (c.c * c.c))
                     - ((2 * CAST(list_dot_product(v.q, c.s) AS BIGINT))
                        / c.c) ASC, c.cell) AS rn
            FROM quant v CROSS JOIN cent{it} c) t
          WHERE rn = 1)""")
        if it < KMEANS_ITERS - 1:
            km.append(f"""sums{it + 1} AS (
              SELECT cell, pos, CAST(sum(x) AS BIGINT) AS sv
              FROM (SELECT cell, unnest(q) AS x,
                           unnest(range(1, len(q) + 1)) AS pos
                    FROM assign{it}) u
              GROUP BY cell, pos)""")
            km.append(f"""cent{it + 1} AS (
              SELECT cell, list(sv ORDER BY pos) AS s, min(c) AS c
              FROM sums{it + 1} JOIN (
                SELECT cell, CAST(count(*) AS BIGINT) AS c
                FROM assign{it} GROUP BY cell) n USING (cell)
              GROUP BY cell)""")
    km.append(f"""asg AS (
      SELECT vec_id, CAST(cell AS INT) AS cluster
      FROM assign{KMEANS_ITERS - 1})""")
    km_ctes = ",\n".join(km)

    o["kmeans_embeddings"] = f"""
        WITH {km_ctes}
        SELECT vec_id, cluster,
               CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT)
                 AS cluster_size
        FROM asg
    """

    o["cluster_summary"] = f"""
        WITH {km_ctes},
        lab AS (
          SELECT a.cluster, e.label,
                 CAST(count(*) AS BIGINT) AS n_l,
                 CAST(sum(d.n_chars) AS BIGINT) AS sc
          FROM asg a
          JOIN embeddings e USING (vec_id)
          JOIN documents d ON d.doc_id = a.vec_id
          GROUP BY a.cluster, e.label
        ),
        per AS (
          SELECT cluster, CAST(sum(n_l) AS BIGINT) AS n_docs,
                 CAST(sum(sc) AS BIGINT) AS sum_chars
          FROM lab GROUP BY cluster
        ),
        dom AS (
          SELECT cluster, label AS dom_label, n_l AS dom_n FROM (
            SELECT *, row_number() OVER (PARTITION BY cluster
                      ORDER BY n_l DESC, label) AS rn
            FROM lab) t
          WHERE rn = 1
        )
        SELECT p.cluster, p.n_docs,
               p.sum_chars / p.n_docs AS mean_chars,
               d.dom_label,
               d.dom_n / p.n_docs AS purity
        FROM per p JOIN dom d USING (cluster)
    """

    # global purity + Rand index from the same contingency table:
    # pair counts via n·(n−1)//2, agreements via inclusion-exclusion
    # IVF over the TRAINED centroids (round 6): final-assignment
    # centroid sums, probe cells ranked per query by the SAME
    # two-division integer distance the training uses, then the
    # unchanged IVF pair/rank formulation over double vectors
    _L = KMEANS_ITERS - 1
    o["ann_ivf_kmeans"] = f"""
        WITH {km_ctes},
        fsums AS (
          SELECT cell, pos, CAST(sum(x) AS BIGINT) AS sv
          FROM (SELECT cell, unnest(q) AS x,
                       unnest(range(1, len(q) + 1)) AS pos
                FROM assign{_L}) u
          GROUP BY cell, pos),
        fcent AS (
          SELECT cell, list(sv ORDER BY pos) AS s, min(c) AS c
          FROM fsums JOIN (
            SELECT cell, CAST(count(*) AS BIGINT) AS c
            FROM assign{_L} GROUP BY cell) n USING (cell)
          GROUP BY cell),
        probe AS (
          SELECT q_id, cell FROM (
            SELECT v.vec_id AS q_id, c.cell,
                   row_number() OVER (PARTITION BY v.vec_id ORDER BY
                     (CAST(list_dot_product(c.s, c.s) AS BIGINT)
                        / (c.c * c.c))
                     - ((2 * CAST(list_dot_product(v.q, c.s) AS BIGINT))
                        / c.c) ASC, c.cell) AS prn
            FROM quant v CROSS JOIN fcent c
            WHERE v.vec_id < {ANN_N_QUERIES}) t
          WHERE prn <= {IVF_NPROBE}),
        nemb2 AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                 sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))) AS nv
          FROM embeddings),
        av AS (
          SELECT n.vec_id, n.v, n.nv, a.cluster AS cell
          FROM nemb2 n JOIN asg a USING (vec_id)),
        pairs AS (
          SELECT p.q_id, av.vec_id,
                 round(list_dot_product(q.v, av.v) / (q.nv * av.nv), 3)
                   AS sim
          FROM probe p
          JOIN av ON av.cell = p.cell
          JOIN nemb2 q ON q.vec_id = p.q_id
          WHERE av.vec_id != p.q_id)
        SELECT q_id, vec_id, sim, CAST(rn AS INT) AS rn FROM (
          SELECT *, row_number() OVER (PARTITION BY q_id
                    ORDER BY sim DESC, vec_id) AS rn
          FROM pairs
        ) t WHERE rn <= {IVF_TOP_K}
    """

    o["cluster_purity_eval"] = f"""
        WITH {km_ctes},
        ct AS (
          SELECT a.cluster, e.label,
                 CAST(count(*) AS BIGINT) AS n_ij
          FROM asg a JOIN embeddings e USING (vec_id)
          GROUP BY a.cluster, e.label
        ),
        rows_ AS (
          SELECT cluster, CAST(sum(n_ij) AS BIGINT) AS n_i,
                 CAST(max(n_ij) AS BIGINT) AS max_ij
          FROM ct GROUP BY cluster
        ),
        cols_ AS (
          SELECT label, CAST(sum(n_ij) AS BIGINT) AS n_j
          FROM ct GROUP BY label
        ),
        s AS (
          SELECT (SELECT CAST(sum(n_ij) AS BIGINT) FROM ct) AS n,
                 (SELECT CAST(sum(n_ij * (n_ij - 1) // 2) AS BIGINT)
                  FROM ct) AS tp,
                 (SELECT CAST(sum(n_i * (n_i - 1) // 2) AS BIGINT)
                  FROM rows_) AS row_pairs,
                 (SELECT CAST(sum(max_ij) AS BIGINT) FROM rows_)
                   AS purity_hits,
                 (SELECT CAST(count(*) AS BIGINT) FROM rows_)
                   AS k_clusters,
                 (SELECT CAST(sum(n_j * (n_j - 1) // 2) AS BIGINT)
                  FROM cols_) AS col_pairs,
                 (SELECT CAST(count(*) AS BIGINT) FROM cols_)
                   AS n_labels
        )
        SELECT n, k_clusters, n_labels,
               CAST(1000 * purity_hits // n AS BIGINT)
                 AS purity_permille,
               CAST(1000 * (n * (n - 1) // 2 + 2 * tp - row_pairs
                    - col_pairs) // (n * (n - 1) // 2) AS BIGINT)
                 AS rand_permille
        FROM s
    """

    from ..operators.similarity import OUTLIER_TOP_K

    # final-assignment centroid state recomputed with the same
    # exact-integer (sums, count) recipe as the iteration CTEs; the
    # scaled distance Σ(c·q_i − s_i)² is pure BIGINT arithmetic
    o["embedding_outliers"] = f"""
        WITH {km_ctes},
        aq AS (
          SELECT a.vec_id, a.cluster, v.q
          FROM asg a JOIN quant v USING (vec_id)
        ),
        fsums AS (
          SELECT cluster, pos, CAST(sum(x) AS BIGINT) AS sv
          FROM (SELECT cluster, unnest(q) AS x,
                       unnest(range(1, len(q) + 1)) AS pos
                FROM aq) u
          GROUP BY cluster, pos
        ),
        fcent AS (
          SELECT cluster, list(sv ORDER BY pos) AS s, min(c) AS c
          FROM fsums JOIN (
            SELECT cluster, CAST(count(*) AS BIGINT) AS c
            FROM aq GROUP BY cluster) n USING (cluster)
          GROUP BY cluster
        ),
        scored AS (
          SELECT aq.vec_id, aq.cluster,
                 CAST(list_sum(list_transform(range(1, len(aq.q) + 1),
                      i -> (fcent.c * aq.q[i] - fcent.s[i])
                           * (fcent.c * aq.q[i] - fcent.s[i])))
                      AS BIGINT) AS dist2_scaled
          FROM aq JOIN fcent USING (cluster)
        ),
        med AS (
          SELECT cluster, round(quantile_cont(dist2_scaled, 0.5), 1)
                   AS median_dist2
          FROM scored GROUP BY cluster
        )
        SELECT cluster, CAST(rn AS INT) AS rn, vec_id, dist2_scaled,
               median_dist2
        FROM (
          SELECT s.*, m.median_dist2,
                 row_number() OVER (PARTITION BY s.cluster
                     ORDER BY s.dist2_scaled DESC, s.vec_id) AS rn
          FROM scored s JOIN med m USING (cluster)
        ) t WHERE rn <= {OUTLIER_TOP_K}
    """

    o["cluster_balanced_sample"] = f"""
        WITH {km_ctes},
        sized AS (
          SELECT vec_id, cluster,
                 CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT)
                   AS cluster_size
          FROM asg
        )
        SELECT vec_id, cluster FROM sized
        WHERE ('0x' || substr(md5('{CLUSTER_SAMPLE_SALT}' || vec_id), 1, 4)
              )::BIGINT
              < CAST(floor({65536 * CLUSTER_SAMPLE_TARGET} / cluster_size)
                     AS BIGINT)
    """

    o["ann_lsh_cosine"] = f"""
        WITH emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        corpus AS (SELECT vec_id, v, {bucket_expr} AS bucket FROM emb),
        pairs AS (
          SELECT q.vec_id AS q_id, e.vec_id,
                 round(list_dot_product(q.v, e.v)
                       / (sqrt(list_dot_product(q.v, q.v))
                          * sqrt(list_dot_product(e.v, e.v))), 3) AS sim
          FROM corpus e JOIN corpus q USING (bucket)
          WHERE q.vec_id < {ANN_N_QUERIES} AND e.vec_id != q.vec_id
        )
        SELECT q_id, vec_id, sim, CAST(rn AS INT) AS rn FROM (
          SELECT *, row_number() OVER (PARTITION BY q_id
                    ORDER BY sim DESC, vec_id) AS rn
          FROM pairs
        ) t WHERE rn <= {ANN_TOP_K}
    """

    # Mirrors operators/similarity.ann_lsh_multiprobe: candidates are
    # corpus vectors whose bucket is within Hamming distance 1 of the
    # query's bucket (own + one-flip probes). The oracle states it as
    # a char-difference predicate over the tiny bucket strings.
    hamming1 = " + ".join(
        f"(CASE WHEN substr(q.bucket, {i}, 1) = substr(e.bucket, {i}, 1)"
        " THEN 0 ELSE 1 END)"
        for i in range(1, ANN_N_PLANES + 1)
    )
    o["ann_lsh_multiprobe"] = f"""
        WITH emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        corpus AS (SELECT vec_id, v, {bucket_expr} AS bucket FROM emb),
        pairs AS (
          SELECT q.vec_id AS q_id, e.vec_id,
                 round(list_dot_product(q.v, e.v)
                       / (sqrt(list_dot_product(q.v, q.v))
                          * sqrt(list_dot_product(e.v, e.v))), 3) AS sim
          FROM corpus e JOIN corpus q
            ON ({hamming1}) <= 1
          WHERE q.vec_id < {ANN_N_QUERIES} AND e.vec_id != q.vec_id
        )
        SELECT q_id, vec_id, sim, CAST(rn AS INT) AS rn FROM (
          SELECT *, row_number() OVER (PARTITION BY q_id
                    ORDER BY sim DESC, vec_id) AS rn
          FROM pairs
        ) t WHERE rn <= {ANN_TOP_K}
    """

    from ..operators.similarity import EMBED_DIM, PCA_ITERS, PCA_V_SCALE

    # Mirrors operators/similarity.embedding_pca_project: exact-integer
    # Gramian + PCA_ITERS power-iteration rounds unrolled as CTEs. The
    # rescale is the identical sign * (|x|*V // max) floor-division
    # expression (HUGEINT holds |x|*V), so both engines walk the same
    # integer eigenvector sequence and projections need no rounding.
    # MATERIALIZED is load-bearing: each pv{r} references gv{r} twice
    # (max subquery + projection), so inlined CTEs would re-expand the
    # chain 2^PCA_ITERS times — materialization evaluates each round
    # once, like the driver loop does.
    V = PCA_V_SCALE
    pca = [
        f"""quant AS MATERIALIZED (
          SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                 x -> CAST(floor(x * {QUANT_SCALE}) AS BIGINT)) AS q
          FROM embeddings)""",
        """upos AS (
          SELECT vec_id, unnest(q) AS x,
                 unnest(range(1, len(q) + 1)) AS pos
          FROM quant)""",
        """gram AS MATERIALIZED (
          SELECT a.pos AS i, b.pos AS j,
                 CAST(sum(a.x * b.x) AS BIGINT) AS g
          FROM upos a JOIN upos b USING (vec_id)
          GROUP BY a.pos, b.pos)""",
        f"""pv0 AS (
          SELECT unnest(range(1, {EMBED_DIM} + 1)) AS i,
                 CAST({V} AS BIGINT) AS x)""",
    ]
    for r in range(1, PCA_ITERS + 1):
        pca.append(f"""gv{r} AS MATERIALIZED (
          SELECT g.i, CAST(sum(g.g * v.x) AS BIGINT) AS x
          FROM gram g JOIN pv{r - 1} v ON v.i = g.j
          GROUP BY g.i)""")
        pca.append(f"""pv{r} AS MATERIALIZED (
          SELECT i, CAST((CASE WHEN x >= 0 THEN 1 ELSE -1 END)
                 * ((CAST(abs(x) AS HUGEINT) * {V})
                    // GREATEST((SELECT max(abs(x)) FROM gv{r}), 1))
                 AS BIGINT) AS x
          FROM gv{r})""")
    pca.append(
        f"vlist AS (SELECT list(x ORDER BY i) AS v FROM pv{PCA_ITERS})"
    )
    o["embedding_pca_project"] = f"""
        WITH {",".join(pca)}
        SELECT q.vec_id,
               CAST(list_dot_product(q.q, vlist.v) AS BIGINT) AS proj
        FROM quant q, vlist
    """

    from ..operators.similarity import SEMDEDUP_DEN, SEMDEDUP_NUM

    # Mirrors operators/similarity.semantic_dedup: same km_ctes
    # assignment, same integer cross-multiplied cosine threshold.
    o["semantic_dedup"] = f"""
        WITH {km_ctes},
        aq AS (
          SELECT a.vec_id, a.cluster, v.q,
                 CAST(list_dot_product(v.q, v.q) AS BIGINT) AS qq
          FROM asg a JOIN quant v USING (vec_id)
        ),
        cand AS (
          SELECT x.vec_id AS va, y.vec_id AS vb,
                 CAST(list_dot_product(x.q, y.q) AS BIGINT) AS qdot,
                 x.qq AS qa, y.qq AS qb
          FROM aq x JOIN aq y
            ON x.cluster = y.cluster AND x.vec_id <> y.vec_id
        ),
        near AS (
          SELECT va,
                 CAST(count(*) AS BIGINT) AS n_near,
                 CAST(sum(CASE WHEN vb < va THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_lower
          FROM cand
          WHERE qdot > 0
            AND qdot * qdot * {SEMDEDUP_DEN * SEMDEDUP_DEN}
                >= {SEMDEDUP_NUM * SEMDEDUP_NUM} * qa * qb
          GROUP BY va
        )
        SELECT a.vec_id, a.cluster,
               COALESCE(n.n_near, 0) AS n_near,
               COALESCE(n.n_lower, 0) > 0 AS dropped
        FROM aq a LEFT JOIN near n ON n.va = a.vec_id
    """

    # recall harness: each method's full independent formulation
    # re-nested as a subquery, intersections recounted — one query
    # re-grades the brute, IVF, LSH, and PQ pipelines AND the
    # evaluator arithmetic
    legs = []
    for method, key in (("ivf", "ann_ivf_cosine"),
                        ("lsh", "ann_lsh_cosine"),
                        ("pq", "ann_pq_cosine")):
        legs.append(f"""
        SELECT '{method}' AS method, qs.q_id,
               CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits
        FROM (SELECT DISTINCT q_id FROM ({o["knn_cosine_brute"]}) b0) qs
        LEFT JOIN (
          SELECT m.q_id, count(*) AS n_hits
          FROM ({o[key]}) m
          JOIN ({o["knn_cosine_brute"]}) b
            ON b.q_id = m.q_id AND b.vec_id = m.vec_id
          GROUP BY m.q_id
        ) h ON h.q_id = qs.q_id""")
    o["ann_recall_eval"] = " UNION ALL ".join(legs)

    # truncated-dimension recall: both legs re-derived (the truncated
    # brute inline on v[1:TRUNC], the full brute nested verbatim)
    from ..operators.similarity import TRUNC_DIMS

    o["knn_truncated_dims_eval"] = f"""
        WITH emb AS (
          SELECT vec_id,
                 (CAST(embedding AS DOUBLE[]))[1:{TRUNC_DIMS}] AS v
          FROM embeddings
        ),
        pairs AS (
          SELECT q.vec_id AS q_id, e.vec_id,
                 round(list_dot_product(q.v, e.v)
                       / (sqrt(list_dot_product(q.v, q.v))
                          * sqrt(list_dot_product(e.v, e.v))), 3) AS sim
          FROM emb e, emb q
          WHERE q.vec_id < {KNN_N_QUERIES} AND e.vec_id != q.vec_id
        ),
        trunc AS (
          SELECT q_id, vec_id FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id
                      ORDER BY sim DESC, vec_id) AS rn
            FROM pairs
          ) t WHERE rn <= {KNN_TOP_K}
        )
        SELECT qs.q_id,
               CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
               CAST({KNN_TOP_K} AS BIGINT) AS k
        FROM (SELECT DISTINCT q_id FROM ({o["knn_cosine_brute"]}) b0) qs
        LEFT JOIN (
          SELECT t.q_id, count(*) AS n_hits
          FROM trunc t
          JOIN ({o["knn_cosine_brute"]}) b
            ON b.q_id = t.q_id AND b.vec_id = t.vec_id
          GROUP BY t.q_id
        ) h ON h.q_id = qs.q_id
    """

    # binary sign-quantized kNN: the identical pack-then-popcount
    # arithmetic restated over 1-based list indexing; both engines
    # shift into the LOW half of each word, so no sign-bit hazard
    from ..operators.similarity import HAMMING_WORD_BITS

    hb = HAMMING_WORD_BITS
    o["knn_hamming_sign"] = f"""
        WITH emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        packed AS (
          SELECT vec_id,
                 CAST(list_sum(list_transform(range(0, {hb}),
                   j -> CASE WHEN v[j + 1] >= 0
                        THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT)
                   AS w0,
                 CAST(list_sum(list_transform(range({hb}, {2 * hb}),
                   j -> CASE WHEN v[j + 1] >= 0
                        THEN (1::BIGINT << (j - {hb})) ELSE 0 END))
                   AS BIGINT) AS w1
          FROM emb
        ),
        pairs AS (
          SELECT q.vec_id AS q_id, e.vec_id,
                 CAST(bit_count(xor(e.w0, q.w0))
                      + bit_count(xor(e.w1, q.w1)) AS INT) AS hamming
          FROM packed e, packed q
          WHERE q.vec_id < {KNN_N_QUERIES} AND e.vec_id != q.vec_id
        )
        SELECT q_id, vec_id, hamming, CAST(rn AS INT) AS rn FROM (
          SELECT *, row_number() OVER (PARTITION BY q_id
                    ORDER BY hamming, vec_id) AS rn
          FROM pairs
        ) t WHERE rn <= {KNN_TOP_K}
    """

    # rendezvous-vs-mod rebalance census: same ×16-tiebroken 48-bit
    # md5 scores, arg_max + FILTER winner per doc
    o["shard_rebalance_eval"] = """
        WITH scored AS (
          SELECT doc_id, s,
                 CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                        || CAST(s AS VARCHAR)), 1, 12) AS BIGINT) * 16
                   + s AS score
          FROM documents,
               (SELECT unnest(range(0, 9)) AS s) sh
        ),
        hrw AS (
          SELECT doc_id,
                 arg_max(s, score) FILTER (WHERE s < 8) AS old_s,
                 arg_max(s, score) AS new_s
          FROM scored GROUP BY doc_id
        ),
        rows_ AS (
          SELECT 'hrw' AS scheme,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(CASE WHEN old_s <> new_s THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_moved
          FROM hrw
          UNION ALL
          SELECT 'mod',
                 CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN doc_id % 8 <> doc_id % 9
                          THEN 1 ELSE 0 END) AS BIGINT)
          FROM documents
        )
        SELECT scheme, n_docs, n_moved,
               CAST(1000 * n_moved // n_docs AS BIGINT)
                 AS moved_permille
        FROM rows_
    """

    return o
