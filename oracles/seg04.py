"""Driver-contract queries + oracle SQL: audio_landmarks, audio_matches, readability, vocab_coverage, image_dhash, dedup_eval, ....

Split from the monolithic __spark_entry__.py (round 5); the contract is
byte-pinned by tests/test_contract_pin.py."""

from __future__ import annotations

from ._shared import DataFrame, F, X, _esc_sq, _t
from .seg02 import (
    _DEBT_TMPL,
    _EMBED_TMPL,
    _UNUSED_TMPL,
    _clone_splice,
    _tmpl_cols,
)
from .seg03 import _landmark_media




def q_audio_landmarks(spark, sf_dir):
    """Spectral landmark extraction
    (operators/audiolandmark.audio_landmarks — the real-FFT tier above
    the envelope hash: per-frame rFFT peak bins packed into Shazam-
    style (binA, binB, dt) pair hashes).  The oracle derives every
    landmark PURELY ARITHMETICALLY from the planted integer tone bins
    — equality pins WAV-encode -> wave-parse -> rFFT -> argmax ->
    bit-packing with no audio bytes in SQL.  Corrupt stripe flagged,
    never dropped."""
    from schema_validator_spark.operators.audiolandmark import (
        audio_landmarks,
    )

    media = _landmark_media(spark, sf_dir)
    out = audio_landmarks(media)
    # corrupt rows keep one sentinel landmark row (-1, not NULL: a
    # NULL in a BIGINT column decays to float64 through the oracle's
    # pandas bridge and the value-hash would compare 16787201.0 vs
    # 16787201)
    return out.select(
        "media_id", "decode_ok", "n_windows",
        F.explode_outer("landmarks").alias("_lm"),
    ).select(
        "media_id", "decode_ok", "n_windows",
        F.coalesce(F.col("_lm"), F.lit(-1).cast("long")).alias("landmark"),
    )


def q_audio_matches(spark, sf_dir):
    """Landmark matching (operators/audiolandmark.landmark_matches —
    the snippet-containment join): clips sharing >= 5 landmarks pair
    up via the capped equi-join; docs with equal d%23 have identical
    bin sequences, so every same-class non-corrupt pair must appear
    with n_shared = 42 (15+14+13 pair-landmarks), cross-class pairs
    share ZERO landmarks by the stride construction, and the oracle
    replays the whole explode -> join -> count from the arithmetic
    hash lists."""
    from schema_validator_spark.operators.audiolandmark import (
        audio_landmarks,
        landmark_matches,
    )

    media = _landmark_media(spark, sf_dir)
    return landmark_matches(audio_landmarks(media), min_shared=5)


def q_readability(spark, sf_dir):
    """Flesch readability scoring
    (functions/synthtext.readability_stats — the education-level
    feature of phi-style quality classifiers): words/sentences/
    vowel-group syllables + Flesch reading ease + FK grade, one
    codegen projection.  Sentences synthesized by turning ' the '
    into sentence breaks; the oracle replays tokenization, the
    sentence splitter, the [aeiouy]+ syllable count, and the exact
    left-associated formula arithmetic."""
    from schema_validator_spark.functions.synthtext import (
        readability_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    content = F.replace(F.col("text"), F.lit(" the "), F.lit(". "))
    return readability_stats(
        docs.select("doc_id", content.alias("text")), ["doc_id"], "text"
    )


_VOCAB_REF = [
    "the", "a", "data", "join", "sort", "merge", "key", "row", "line",
    "table", "stream", "batch", "window", "filter", "group", "query",
    "scan", "agg", "column", "value",
]


def q_vocab_coverage(spark, sf_dir):
    """Vocabulary-coverage audit
    (functions/wordlist.vocab_coverage_stats — the tokenizer-migration
    / UNK-rate check): per-doc token count, out-of-vocabulary count,
    and OOV rate against a reference vocabulary (exact lowercase
    token membership, InSet probe, zero shuffles).  The oracle replays
    tokenization + NOT IN membership + the rate division."""
    from schema_validator_spark.functions.wordlist import (
        vocab_coverage_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    return vocab_coverage_stats(docs, ["doc_id"], "text", _VOCAB_REF)


def q_image_dhash(spark, sf_dir):
    """Gradient (difference) image hashing
    (operators/imagehash.image_dhashes — the brightness-shift-robust
    twin of the aHash tier: every bit is a LOCAL pixel gradient, so
    the re-encode artifacts that flip mean-relative aHash bits leave
    it untouched).  REAL 8x9 grayscale PNGs are generated in
    executors with pixel (r,c) = (r*37 + c*kd*13) % 251, kd = 1 +
    doc%7; the oracle rebuilds the EXPECTED hash purely
    arithmetically (bit = p(r,c) < p(r,c+1), packed as two 32-bit
    halves) — equality pins encode -> decode -> gradient -> bit-pack
    with no image bytes in SQL.  doc_id%19 is a corrupt stripe."""
    from schema_validator_spark.operators.imagehash import image_dhashes

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(batches):
        import numpy as np
        import pandas as pd

        from schema_validator_spark.functions.png import encode_png

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 19 == 0:
                    rows.append((did, b"NOTPNG" + str(did).encode()))
                    continue
                kd = 1 + did % 7
                px = np.asarray(
                    [(r * 37 + c * kd * 13) % 251
                     for r in range(8) for c in range(9)],
                    dtype=np.uint8,
                ).reshape(8, 9)
                rows.append((did, encode_png(px)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    return image_dhashes(media)


def q_dedup_eval(spark, sf_dir):
    """Dedup-tier precision/recall audit
    (operators/paireval.pair_metrics — the runtime version of every
    tier's pinned exactness argument: score a candidate-pair frame
    against an exact ground truth on a sample).  Predicted pairs =
    fingerprint-equal docs (case/space-blind); truth = byte-equal
    docs.  Stripes: doc pairs (2k, 2k+1) are byte-identical for
    k%5==0 (true dups) and fingerprint-equal-only for k%5==1 (the
    tier's deliberate false positives) — so precision lands near 0.5
    and recall at 1.0, exercising every metric.  Oracle replays both
    self-joins and the metric arithmetic."""
    from schema_validator_spark.operators.paireval import pair_metrics

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    k = F.floor(did / 2)
    ks = k.cast("string")
    text = (
        F.when(k % 5 == 0, F.concat(F.lit("copy text block "), ks))
        .when(
            (k % 5 == 1) & (did % 2 == 0),
            F.concat(F.lit("near text block "), ks),
        )
        .when(
            (k % 5 == 1) & (did % 2 == 1),
            F.concat(F.lit("Near  TEXT block "), ks),
        )
        .otherwise(F.concat(F.lit("unique "), did.cast("string")))
    )
    d = docs.select("doc_id", text.alias("text"), X.fingerprint(text).alias("fp"))
    a = d.select(F.col("doc_id").alias("id_a"),
                 F.col("text").alias("_ta"), F.col("fp").alias("_fa"))
    b = d.select(F.col("doc_id").alias("id_b"),
                 F.col("text").alias("_tb"), F.col("fp").alias("_fb"))
    pred = a.join(
        b, (F.col("_fa") == F.col("_fb")) & (F.col("id_a") < F.col("id_b"))
    ).select("id_a", "id_b")
    truth = a.join(
        b, (F.col("_ta") == F.col("_tb")) & (F.col("id_a") < F.col("id_b"))
    ).select("id_a", "id_b")
    return pair_metrics(pred, truth)


def q_web_curation(spark, sf_dir):
    """End-to-end web-corpus funnel
    (operators/curateweb.curate_web — synthetic-text gate -> word-list
    gate -> n-gram saturation cap -> per-domain cap, one lazy plan).
    Stripes (precedence %13 > %7 > %11): disclaimer append (stage-1
    drop), ' vileword' append (stage-2), identical shared paragraph
    (saturation 1.0, stage-3); domains: %41 NULL (never capped), %3
    hot.com (over cap 20), else 37 cold domains.  The oracle replays
    every stage: phrase gate (the statistical tier provably cannot
    fire — no synthesized doc reaches 5 sentences), exact token
    membership, the full shingle/doc-freq/cross-multiply saturation
    over stage-2 SURVIVORS, and the md5-rank domain cap."""
    from schema_validator_spark.operators.curateweb import curate_web

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    text = (
        F.when(
            did % 13 == 0,
            F.concat(
                F.col("text"),
                F.lit(" As an AI language model, I cannot continue."),
            ),
        )
        .when(did % 7 == 0, F.concat(F.col("text"), F.lit(" vileword")))
        .when(
            did % 11 == 0,
            F.lit("common shared paragraph block alpha beta gamma "
                  "delta epsilon zeta eta theta"),
        )
        .otherwise(F.col("text"))
    )
    domain = (
        F.when(did % 41 == 0, F.lit(None).cast("string"))
        .when(did % 3 == 0, F.lit("hot.com"))
        .otherwise(
            F.concat(F.lit("d"), (did % 37).cast("string"), F.lit(".com"))
        )
    )
    df = docs.select("doc_id", text.alias("text"), domain.alias("domain"))
    out = curate_web(df, blocked_terms=["vileword"], domain_cap=20)
    return out.select("doc_id", "domain")


def q_audio_envelope(spark, sf_dir):
    """Audio energy-envelope fingerprinting
    (operators/audiohash.audio_fingerprints — the audio-modality
    aHash: 64 windows, bit = window energy above the clip mean by
    strict integer cross-multiply): REAL 16-bit PCM WAVs are
    generated in executors (stdlib wave) with window-constant
    amplitudes a_w = ((w*13 + id) % 8) * 1000, plus a corrupt stripe
    (id%13 -> not-a-WAV, decode_ok=false, NULL fingerprint).  The
    oracle derives the EXPECTED fingerprint purely arithmetically
    (energy_w = 16·a_w², bit iff a_w²·64 > Σa²) — equality pins the
    whole WAV-encode -> parse -> window-energy -> bit-pack pipeline
    with no audio bytes in SQL."""
    from schema_validator_spark.operators.audiohash import (
        audio_fingerprints,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(batches):
        import io
        import wave as wavmod

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 13 == 0:
                    rows.append((did, b"NOTWAV" + str(did).encode()))
                    continue
                amps = np.array(
                    [((w * 13 + did) % 8) * 1000 for w in range(64)],
                    dtype="<i2",
                )
                samples = np.repeat(amps, 16)
                bio = io.BytesIO()
                with wavmod.open(bio, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(8000)
                    wf.writeframes(samples.tobytes())
                rows.append((did, bio.getvalue()))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    return audio_fingerprints(media)


def _jsonspec_drift_oracle_sql() -> str:
    """Replay q_jsonspec_drift: both sides' JSON synthesis + VARIANT
    type walk (DuckDB JSON functions, same canon mapping as the
    json_spec oracle), reduced to key grain (majority type with
    (n_type desc, vtype asc) ties; 6dp presence), full-outer-joined."""
    canon = """
        case json_type(v, '$.' || key)
          when 'OBJECT' then 'object'
          when 'ARRAY' then 'array'
          when 'VARCHAR' then 'string'
          when 'BOOLEAN' then 'bool'
          when 'NULL' then 'null'
          when 'DOUBLE' then 'float'
          when 'BIGINT' then 'int'
          when 'UBIGINT' then 'int'
          else lower(json_type(v, '$.' || key))
        end"""
    bjs = """case when event_id % 97 = 0 then 'not json' else
          '{"k": ' || (event_id % 100) || ', "device": "m'
          || (user_id % 3)
          || (case when user_id % 3 = 0 then '", "legacy": true}'
              else '"}' end) end"""
    cjs = """case when event_id % 97 = 0 then 'not json' else
          '{"k": "' || (event_id % 100) || '", "device": "m'
          || (user_id % 3)
          || (case when user_id % 3 <= 1
              then '", "fresh": ' || (event_id % 9) || '.5}'
              else '"}' end) end"""

    def side(name, js, par, pfx):
        return f"""
    {name}_j as (
      select {js} as js from events where event_id % 2 = {par}
    ),
    {name}_p as (select js, try_cast(js as json) as v from {name}_j),
    {name}_tot as (
      select cast(count(*) filter (where json_type(v) = 'OBJECT')
                  as bigint) as n_obj
      from {name}_p
    ),
    {name}_kv as (
      select unnest(json_keys(v)) as key, v
      from {name}_p where json_type(v) = 'OBJECT'
    ),
    {name}_counts as (
      select key, vtype, cast(count(*) as bigint) as n_type from (
        select key, {canon} as vtype from {name}_kv
      ) group by 1, 2
    ),
    {name}_grain as (
      select key, vtype as {pfx}_type,
             round(cast(n_key as double) / n_obj, 6) as {pfx}_presence
      from (
        select key, vtype, n_type,
               row_number() over (partition by key
                                  order by n_type desc, vtype asc) as rn,
               cast(sum(n_type) over (partition by key) as bigint)
                 as n_key
        from {name}_counts
      ) w cross join {name}_tot
      where rn = 1
    )"""

    return f"""
    with {side('b', bjs, 0, 'base')},
    {side('c', cjs, 1, 'curr')}
    select coalesce(b.key, c.key) as key,
           case when b.key is null then 'added'
                when c.key is null then 'removed'
                else 'common' end as status,
           base_type, curr_type,
           case when base_type is not null and curr_type is not null
                     and base_type <> curr_type
                then 1 else 0 end as type_changed,
           coalesce(base_presence, 0.0) as base_presence,
           coalesce(curr_presence, 0.0) as curr_presence,
           round(coalesce(curr_presence, 0.0)
                 - coalesce(base_presence, 0.0), 6) as presence_delta
    from b_grain b full outer join c_grain c on b.key = c.key
"""


def _vocab_coverage_oracle_sql() -> str:
    """Replay q_vocab_coverage from the same _VOCAB_REF constant:
    independent tokenization + NOT IN membership + rate division."""
    terms = ", ".join(f"'{t}'" for t in sorted(set(_VOCAB_REF)))
    return rf"""
    with b as (
      select doc_id,
             list_filter(string_split_regex(
                 trim(lower(coalesce(text, ''))), '\s+'),
               x -> x <> '') as tk
      from documents
    )
    select doc_id,
           cast(len(tk) as bigint) as n_tokens,
           cast(len(list_filter(tk, t -> t not in ({terms})))
                as bigint) as n_oov,
           case when len(tk) > 0 then
             cast(len(list_filter(tk, t -> t not in ({terms})))
                  as double) / cast(len(tk) as double)
           else 0.0 end as oov_rate
    from b
"""


# Independent replay of q_readability: same synthesis, independent
# tokenization/sentence/syllable derivations, identical
# left-associated Flesch arithmetic.
_READABILITY_ORACLE_SQL = r"""
    with synth as (
      select doc_id, replace(text, ' the ', '. ') as text
      from documents
    ),
    b as (select doc_id, lower(coalesce(text, '')) as lt from synth),
    m as (
      select doc_id,
             cast(len(list_filter(string_split_regex(trim(lt), '\s+'),
                                  x -> x <> '')) as bigint) as n_words,
             cast(len(list_filter(
                    list_transform(string_split_regex(lt, '[.!?]+'),
                                   s -> strlen(trim(s))),
                    n -> n > 0)) as bigint) as n_sents,
             cast(len(regexp_extract_all(lt, '[aeiouy]+')) as bigint)
               as n_syllables
      from b
    )
    select doc_id, n_words, n_sents, n_syllables,
           case when n_words > 0 and n_sents > 0 then
             206.835
             - 1.015 * (cast(n_words as double) / cast(n_sents as double))
             - 84.6 * (cast(n_syllables as double)
                       / cast(n_words as double))
           else 0.0 end as flesch,
           case when n_words > 0 and n_sents > 0 then
             0.39 * (cast(n_words as double) / cast(n_sents as double))
             + 11.8 * (cast(n_syllables as double)
                       / cast(n_words as double))
             - 15.59
           else 0.0 end as fk_grade
    from m
"""


def _web_curation_oracle_sql() -> str:
    """Replay q_web_curation stage by stage.  Stage 1 replays the
    phrase tier only: the statistical tier requires >= 5 sentences
    and the synthesized corpus provably never reaches 2 (the word-
    salad documents text contains no [.!?]; the only periods come
    from the appended disclaimer) — phrase containment IS the flag.
    Stages 2-4 are full replays: exact token membership, the k=5
    shingle + doc-frequency + strict cross-multiply saturation over
    stage-2 survivors, and the md5-rank domain cap."""
    from schema_validator_spark.functions.synthtext import (
        DEFAULT_PHRASES,
    )

    no_phrase = " and ".join(
        f"not contains(lower(text), '{p}')" for p in DEFAULT_PHRASES
    )
    return rf"""
    with synth as (
      select doc_id,
             case when doc_id % 13 = 0 then
                    text || ' As an AI language model, I cannot continue.'
                  when doc_id % 7 = 0 then text || ' vileword'
                  when doc_id % 11 = 0 then
                    'common shared paragraph block alpha beta gamma '
                    || 'delta epsilon zeta eta theta'
                  else text end as text,
             case when doc_id % 41 = 0 then null
                  when doc_id % 3 = 0 then 'hot.com'
                  else 'd' || cast(doc_id % 37 as varchar) || '.com'
             end as domain
      from documents
    ),
    s1 as (select * from synth where {no_phrase}),
    s2 as (
      select * from s1
      where not list_contains(
        list_filter(string_split_regex(trim(lower(text)), '\s+'),
                    x -> x <> ''),
        'vileword')
    ),
    w as (
      select doc_id, domain,
             list_filter(string_split_regex(trim(coalesce(text, '')),
                                            '\s+'),
                         t -> t <> '') as w
      from s2
    ),
    g as (
      select doc_id, domain,
             case when len(w) >= 5
               then list_distinct(list_transform(range(1, len(w) - 3),
                      i -> array_to_string(w[i:i+4], ' ')))
               else [array_to_string(w, ' ')] end as gs
      from w
    ),
    pairsg as (
      select doc_id, domain, len(gs) as n_grams, unnest(gs) as g from g
    ),
    dfreq as (select g, count(*) as df from pairsg group by g),
    sat as (
      select doc_id, max(domain) as domain,
             max(n_grams) as n_grams,
             sum(case when df >= 2 then 1 else 0 end) as n_common
      from pairsg join dfreq using (g)
      group by doc_id
    ),
    s3 as (
      select doc_id, domain from sat
      where not (n_common * 1000000 > 500000 * n_grams)
    ),
    counts as (
      select domain, count(*) as n from s3
      where domain is not null group by 1
    ),
    ranked as (
      select s.doc_id, s.domain, n,
             row_number() over (
               partition by s.domain
               order by md5(cast(s.doc_id as varchar)), s.doc_id
             ) as rn
      from s3 s join counts using (domain)
      where s.domain is not null
    )
    select doc_id, domain from ranked where n <= 20 or rn <= 20
    union all
    select doc_id, domain from s3 where domain is null
"""


# Independent replay of q_dedup_eval: same synthesis, both self-joins
# (DuckDB's own md5 of the normalized form vs byte equality), then the
# canonical-pair full outer and the metric arithmetic in the same
# left-associated order.
_DEDUP_EVAL_ORACLE_SQL = r"""
    with synth as (
      select doc_id,
             case when (doc_id // 2) % 5 = 0 then
                    'copy text block ' || cast(doc_id // 2 as varchar)
                  when (doc_id // 2) % 5 = 1 and doc_id % 2 = 0 then
                    'near text block ' || cast(doc_id // 2 as varchar)
                  when (doc_id // 2) % 5 = 1 and doc_id % 2 = 1 then
                    'Near  TEXT block ' || cast(doc_id // 2 as varchar)
                  else 'unique ' || cast(doc_id as varchar)
             end as text
      from documents
    ),
    fp as (
      select doc_id, text,
             md5(trim(regexp_replace(regexp_replace(lower(text),
                 '[^\p{L}\p{Nd}\s]', '', 'g'), '\s+', ' ', 'g'))) as f
      from synth
    ),
    pred as (
      select distinct a.doc_id as pa, b.doc_id as pb
      from fp a join fp b on a.f = b.f and a.doc_id < b.doc_id
    ),
    truth as (
      select distinct a.doc_id as pa, b.doc_id as pb
      from synth a join synth b
        on a.text = b.text and a.doc_id < b.doc_id
    ),
    j as (
      select p.pa as ppa, t.pa as tpa
      from pred p full outer join truth t
        on p.pa = t.pa and p.pb = t.pb
    ),
    m as (
      select cast(count(ppa) as bigint) as n_pred,
             cast(count(tpa) as bigint) as n_true,
             cast(count(*) filter (where ppa is not null
                                   and tpa is not null) as bigint)
               as n_hit
      from j
    ),
    pr as (
      select n_pred, n_true, n_hit,
             case when n_pred > 0 then
               cast(n_hit as double) / cast(n_pred as double)
             else 0.0 end as precision,
             case when n_true > 0 then
               cast(n_hit as double) / cast(n_true as double)
             else 0.0 end as recall
      from m
    )
    select n_pred, n_true, n_hit, precision, recall,
           case when precision + recall > 0 then
             2.0 * precision * recall / (precision + recall)
           else 0.0 end as f1
    from pr
"""


# Arithmetic replay of q_image_dhash: bit (r,c) = p(r,c) < p(r,c+1)
# over the planted pixel formula; rows 0-3 pack into the high 32-bit
# half, rows 4-7 into the low (1::BIGINT << 63 would overflow), hex
# via printf.
_IMAGE_DHASH_ORACLE_SQL = """
    with base as (select doc_id from documents),
    ok as (
      select doc_id, 1 + doc_id % 7 as kd
      from base where doc_id % 19 <> 0
    ),
    halves as (
      select doc_id,
        cast(list_sum(flatten(list_transform(range(0, 4), r ->
          list_transform(range(0, 8), c ->
            case when ((r*37 + c*kd*13) % 251)
                      < ((r*37 + (c+1)*kd*13) % 251)
              then 1::bigint << (31 - (r*8 + c)) else 0 end))))
          as bigint) as hi,
        cast(list_sum(flatten(list_transform(range(4, 8), r ->
          list_transform(range(0, 8), c ->
            case when ((r*37 + c*kd*13) % 251)
                      < ((r*37 + (c+1)*kd*13) % 251)
              then 1::bigint << (63 - (r*8 + c)) else 0 end))))
          as bigint) as lo
      from ok
    )
    select doc_id as media_id, true as decode_ok, 9 as width,
           8 as height, printf('%08x%08x', hi, lo) as dhash
    from halves
    union all
    select doc_id, false, -1, -1, cast(null as varchar)
    from base where doc_id % 19 = 0
"""


# Arithmetic replay of the spectral-landmark queries: expected rFFT
# peak bins ARE the planted tone bins, so the landmark sets derive in
# closed form (ks[t+1] is 1-based: element t of the bin list); the
# match oracle replays explode -> join -> count over those lists.
# Every landmark hash belongs to exactly one d%23 class (the stride
# argument in _landmark_media's docstring), so buckets are class-sized
# — far below the Spark tier's cap at every SF, capped == uncapped.
_LANDMARK_BASE_SQL = """
    with base as (select doc_id from documents),
    k as (
      select doc_id,
             list_transform(range(0, 16),
                            w -> 3 + ((w * ((doc_id % 23) + 2)
                                       + (doc_id % 23)) % 29)) as ks
      from base where doc_id % 17 <> 0
    ),
    h as (
      select doc_id,
             list_sort(list_distinct(flatten(list_transform([1, 2, 3],
               dt -> list_transform(range(0, 16 - dt),
                 t -> cast(ks[t+1] * 1048576 + ks[t+dt+1] * 256 + dt
                           as bigint)))))) as hs
      from k
    )
"""

_AUDIO_LANDMARKS_ORACLE_SQL = _LANDMARK_BASE_SQL + """
    select doc_id as media_id, true as decode_ok,
           16 as n_windows, unnest(hs) as landmark
    from h
    union all
    select doc_id as media_id, false as decode_ok,
           -1 as n_windows, cast(-1 as bigint) as landmark
    from base where doc_id % 17 = 0
"""

_AUDIO_MATCHES_ORACLE_SQL = _LANDMARK_BASE_SQL + """
    , ex as (select doc_id, unnest(hs) as lh from h)
    select a.doc_id as id_a, b.doc_id as id_b,
           cast(count(*) as bigint) as n_shared
    from ex a join ex b on a.lh = b.lh and a.doc_id < b.doc_id
    group by 1, 2
    having count(*) >= 5
"""


# Independent replay of q_domain_caps: group counts + md5-rank
# row_number over the over-cap groups only; under-cap and NULL-domain
# rows pass through by construction.
_DOMAIN_CAPS_ORACLE_SQL = """
    with synth as (
      select doc_id,
             case when doc_id % 41 = 0 then null
                  when doc_id % 3 = 0 then 'hot.com'
                  else 'd' || cast(doc_id % 37 as varchar) || '.com'
             end as reg_domain
      from documents
    ),
    counts as (
      select reg_domain, count(*) as n from synth
      where reg_domain is not null group by 1
    ),
    ranked as (
      select s.doc_id, s.reg_domain, n,
             row_number() over (
               partition by s.reg_domain
               order by md5(cast(s.doc_id as varchar)), s.doc_id
             ) as rn
      from synth s join counts using (reg_domain)
      where s.reg_domain is not null
    )
    select doc_id, reg_domain from ranked where n <= 20 or rn <= 20
    union all
    select doc_id, reg_domain from synth where reg_domain is null
"""


# Independent replay of q_hard_negatives: exact cosine (sequential
# double fold, same association as the Spark HOF), label exclusion
# BEFORE ranking, (cosine desc, vec_id asc) row_number.
_HARD_NEGATIVES_ORACLE_SQL = """
    with q as (
      select vec_id as query_id, embedding::DOUBLE[] as qv,
             label as ql
      from embeddings where vec_id < 6
    ),
    c as (
      select vec_id, embedding::DOUBLE[] as cv, label as cl
      from embeddings
    ),
    scored as (
      select query_id, vec_id,
             round(
               list_sum(list_transform(range(1, len(qv) + 1),
                                       i -> qv[i] * cv[i]))
               / (sqrt(list_sum(list_transform(qv, x -> x * x)))
                  * sqrt(list_sum(list_transform(cv, x -> x * x)))),
               6) as cosine
      from q cross join c
      where ql is null or cl is null or ql <> cl
    )
    select query_id, vec_id, cosine, rank from (
      select query_id, vec_id, cosine,
             row_number() over (partition by query_id
                                order by cosine desc, vec_id asc)
               as rank
      from scored
    ) where rank <= 5
"""


# Independent replay of q_ngram_saturation: k=5 shingles (the
# k-specific inclusive-slice template: starts range(1, n-3), slice
# w[i:i+4]; arrays shorter than k join to ONE gram so no doc
# vanishes), doc frequency by plain count over per-doc-distinct
# grams, then the per-doc common fraction.
_NGRAM_SATURATION_ORACLE_SQL = r"""
    with synth as (
      select doc_id,
             case when doc_id % 5 = 0 then
               text || ' anchor one two three four five six seven eight nine'
             else text end as text
      from documents
    ),
    w as (
      select doc_id,
             list_filter(string_split_regex(trim(coalesce(text, '')),
                                            '\s+'),
                         t -> t <> '') as w
      from synth
    ),
    g as (
      select doc_id,
             case when len(w) >= 5
               then list_distinct(list_transform(range(1, len(w) - 3),
                      i -> array_to_string(w[i:i+4], ' ')))
               else [array_to_string(w, ' ')] end as gs
      from w
    ),
    pairs as (
      select doc_id, len(gs) as n_grams, unnest(gs) as g from g
    ),
    dfreq as (select g, count(*) as df from pairs group by g)
    select doc_id,
           cast(max(n_grams) as bigint) as n_grams,
           cast(sum(case when df >= 2 then 1 else 0 end) as bigint)
             as n_common,
           round(cast(sum(case when df >= 2 then 1 else 0 end) as double)
                 / max(n_grams), 6) as saturation
    from pairs join dfreq using (g)
    group by doc_id
"""


def _synthtext_oracle_sql() -> str:
    """Replay q_synthetic_text: same stripes, then an independent
    implementation of tokenization (string_split_regex + filter),
    phrase substring probes, edge-punct slop membership, and the
    population-CV over sentence OCTET lengths.  Phrase/slop/punct
    constants import from the module — single source of truth."""
    from schema_validator_spark.functions.synthtext import (
        DEFAULT_PHRASES,
        DEFAULT_SLOP_TERMS,
        _EDGE_PUNCT,
    )

    phrase_sum = " + ".join(
        f"(case when contains(lt, '{p}') then 1 else 0 end)"
        for p in DEFAULT_PHRASES
    )
    slop_list = ", ".join(f"'{t}'" for t in sorted(DEFAULT_SLOP_TERMS))
    return rf"""
    with synth as (
      select doc_id,
             case when doc_id % 13 = 0 then
                    text || ' As an AI language model, I cannot continue.'
                  when doc_id % 17 = 0 then
                    repeat('We delve into the vibrant tapestry of region '
                           || cast(doc_id % 7 as varchar) || ' results. ', 6)
                  else text end as text
      from documents
    ),
    base as (
      select doc_id, lower(coalesce(text, '')) as lt from synth
    ),
    arrs as (
      select doc_id, lt,
             list_filter(string_split_regex(trim(lt), '\s+'),
                         x -> x <> '') as tk,
             list_filter(
               list_transform(string_split_regex(lt, '[.!?]+'),
                              s -> strlen(trim(s))),
               n -> n > 0) as slens
      from base
    ),
    m as (
      select doc_id,
             len(tk) as n_tokens,
             len(slens) as n_sents,
             ({phrase_sum}) as phrase_hits,
             len(list_filter(tk,
                 t -> trim(t, '{_EDGE_PUNCT}') in ({slop_list})))
               as slop_hits,
             coalesce(list_sum(slens), 0) as s1,
             coalesce(list_sum(list_transform(slens, x -> x * x)), 0) as s2
      from arrs
    ),
    cv as (
      select *,
             case when n_sents > 0
               then cast(s1 as double) / cast(n_sents as double)
               else 0.0 end as mean_len
      from m
    ),
    fin as (
      select doc_id, n_tokens, n_sents, phrase_hits, slop_hits,
             case when n_tokens > 0
               then cast(slop_hits as double) * 1000.0
                    / cast(n_tokens as double)
               else 0.0 end as slop_per_1k,
             case when n_sents > 0 and mean_len > 0
               then sqrt(greatest(0.0,
                      cast(s2 as double) / cast(n_sents as double)
                      - mean_len * mean_len)) / mean_len
               else 0.0 end as sent_len_cv
      from cv
    )
    select doc_id, n_tokens, n_sents, phrase_hits, slop_hits,
           slop_per_1k, sent_len_cv,
           case when phrase_hits > 0
                  or (n_sents >= 5 and n_tokens > 0
                      and slop_hits * 1000000 >= 15000 * n_tokens
                      and sent_len_cv <= 0.35)
                then 1 else 0 end as ai_flag
    from fin
"""


# Independent replay of q_semantic_contamination: rebuild both eval
# stripes, exact cosine in sequential-double arithmetic (same fold
# order as the Spark HOF tier), argmax via row_number (cosine desc,
# eval_id asc) = the engine's max-struct over (cosine, -eval_id).
_SEMCONTAM_ORACLE_SQL = """
    with ev as (
      select vec_id + 1000000 as eval_id,
             list_transform(embedding::DOUBLE[], x -> x * 2.0) as v
      from embeddings where vec_id % 10 = 0 and vec_id < 1000
      union all
      select vec_id + 2000000,
             list_prepend(embedding[1]::DOUBLE * 3.0,
                          (embedding::DOUBLE[])[2:])
      from embeddings where vec_id % 10 = 5 and vec_id < 1000
    ),
    evn as (
      -- ne > 0 mirrors the engine's _collect_eval zero-norm drop: a
      -- zero eval vector would otherwise yield 0/0 = NaN cosines and
      -- could corrupt the argmax (no such vector at any shipped SF;
      -- filter kept for robustness to future data).
      select eval_id, v, ne from (
        select eval_id, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) as ne
        from ev
      ) where ne > 0
    ),
    tr as (
      select vec_id, embedding::DOUBLE[] as tv,
             sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                          x -> x * x))) as nt
      from embeddings
    ),
    scored as (
      select tr.vec_id, evn.eval_id,
             round(
               list_sum(list_transform(range(1, len(tv) + 1),
                                       i -> tv[i] * v[i]))
               / (nt * ne), 6) as cosine
      from tr cross join evn
      where nt > 0
    ),
    best as (
      select vec_id, eval_id, cosine,
             row_number() over (partition by vec_id
                                order by cosine desc, eval_id asc) as rn
      from scored
    )
    select vec_id, eval_id, cosine from best
    where rn = 1 and cosine >= 0.8
"""


_AUDIO_ENVELOPE_ORACLE_SQL = """
    with ok as (
      select doc_id from documents where doc_id % 13 <> 0
    ), wins as (
      select doc_id, w,
             cast(((w * 13 + doc_id) % 8) * 1000 as bigint) as a
      from ok, unnest(range(64)) as t(w)
    ), tot as (
      select doc_id, sum(a * a) as s from wins group by doc_id
    ), hv as (
      select wn.doc_id,
             sum(case when wn.a * wn.a * 64 > t.s
                 then (1::UBIGINT << (63 - cast(wn.w as int)))
                 else 0::UBIGINT end) as v
      from wins wn join tot t on t.doc_id = wn.doc_id
      group by wn.doc_id
    )
    select doc_id as media_id, true as decode_ok,
           1024 as n_frames, 8000 as sample_rate,
           lpad(lower(hex(cast(v as ubigint))), 16, '0') as fingerprint
    from hv
    union all
    select doc_id, false, -1, -1, NULL
    from documents where doc_id % 13 = 0
"""


#: bm25 synthesis terms — underscore/digit shapes the natural-word
#: vocabulary of documents.text cannot collide with
_BM25_TERMS = ["serialize_v2", "mutex_guard", "qsort_3way"]


def q_bm25_search(spark, sf_dir):
    """BM25 keyword retrieval (operators/search.bm25_search): score =
    Σ per-term 6dp-scaled INTEGER contributions (order-independent sum
    — any engine replaying the arithmetic reproduces score_e6
    bit-exactly), tf via array filters in ONE codegen projection,
    corpus stats (N, avgdl, document frequencies) in ONE broadcast agg
    row, global top-50 via the salted two-level reduction.  Stripes
    plant the three terms at different tf (x2 / x1 / x3) on different
    modular grids so tf saturation, idf, and length norm all vary."""
    from schema_validator_spark.operators.codedup import code_tokens
    from schema_validator_spark.operators.search import bm25_search

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    content = F.concat(
        F.col("text"),
        F.when(did % 7 == 0, F.lit(" serialize_v2 serialize_v2"))
        .otherwise(F.lit("")),
        F.when(did % 11 == 0, F.lit(" mutex_guard")).otherwise(F.lit("")),
        F.when(
            did % 13 == 0,
            F.lit(" qsort_3way qsort_3way qsort_3way"),
        ).otherwise(F.lit("")),
    )
    df = docs.select(did.alias("doc_id"), content.alias("content"))
    out = bm25_search(
        df, "doc_id", code_tokens(F.col("content")), _BM25_TERMS, top_k=50
    )
    return out.select("doc_id", "matched_terms", "score_e6", "rank")


#: function-complexity synthesis (m = doc_id % 3): decision-rich
#: multi-unit files; the mid line repeats doc_id % 3 + 1 times so
#: per-chunk decision counts vary per doc.
_FCPLX_TMPL: dict[int, tuple[str, str, str, str]] = {
    0: ("py", "def f@(x):\n", "    if x > @:\n        x = x - 1\n",
        "    return x\n\ndef g@():\n    return 0\n"),
    1: ("go", "package p\n\nfunc A@() int {\n",
        "\tif x > @ && x < 9 {\n\t\tx--\n\t}\n",
        "\treturn 0\n}\n\nfunc B@() int {\n"
        "\tfor i := 0; i < 3; i++ {\n\t}\n\treturn 0\n}\n"),
    2: ("js", "function a@() {\n",
        "  if (x || x > @) { x -= 1 }\n",
        "  return x\n}\nclass C@ {}\n"),
}


def q_function_complexity(spark, sf_dir):
    """Function-grain complexity — the chunker composed with the
    complexity metrics (the SantaCoder-style 'flag the monster
    functions' view file-grain code_complexity can't give):
    chunk_functions splits files into top-level units (zero-shuffle
    HOF slicing), complexity_stats scores EACH CHUNK (per-lang
    whole-word decision counts, &&/|| length-delta, tab-expanded max
    indent, McCabe proxy).  The oracle composes the chunker's
    INDEPENDENT line-window derivation with the metric arithmetic, so
    the composition is cross-checked end-to-end."""
    from schema_validator_spark.operators.codechunk import chunk_functions
    from schema_validator_spark.operators.complexity import (
        complexity_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    k = did.cast("string")
    rep = (did % 3 + 1).cast("int")
    lang = content = None
    for i, (lg, head, mid, tail) in sorted(_FCPLX_TMPL.items()):
        cond = did % 3 == i
        body = F.concat(
            _clone_splice(head, k),
            F.repeat(_clone_splice(mid, k), rep),
            _clone_splice(tail, k),
        )
        lg_lit = F.lit(lg)
        lang = F.when(cond, lg_lit) if lang is None else lang.when(
            cond, lg_lit
        )
        content = F.when(cond, body) if content is None else content.when(
            cond, body
        )
    df = docs.select(
        did.alias("doc_id"), lang.alias("lang"), content.alias("content")
    )
    ch = chunk_functions(
        df, ["doc_id", "lang"], "content", "lang", with_sha=False
    )
    return complexity_stats(
        ch, "chunk_text", "lang", keep_cols=["doc_id", "chunk_idx"]
    )


def q_embedded_text(spark, sf_dir):
    """Embedded natural-text extraction
    (functions/embedded.embedded_text): string literals + comments as
    (kind, text) rows — the NL channel of a code corpus (feeds
    lang-id/PII/decontamination without treating files as prose).
    Ordered masking: strings first (a // inside a URL literal never
    spawns a comment), block comments before line comments (no double
    emit).  One codegen projection + one explode, zero shuffles."""
    from schema_validator_spark.functions.embedded import embedded_text

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    lang, content = _tmpl_cols(_EMBED_TMPL, did % 4, did.cast("string"))
    df = docs.select(
        did.alias("doc_id"), lang.alias("lang"), content.alias("content")
    )
    return embedded_text(df, ["doc_id"], "content", "lang")


#: comment_lang_mix synthesis (m = doc_id % 5): en py comment; es js
#: comment behind an ENGLISH string literal (the channel-separation
#: trap — strings mask first); de go block comment; a comment-free py
#: file (excluded from the mix); a stopword-free js comment (counted
#: as 'unknown').  Splices sit on non-marker tokens only.
_CMTLANG_TMPL: dict[int, tuple[str, str]] = {
    0: ("py", "# the result is in the set for it w@\nx@ = 1\n"),
    1: ("js", 'const s@ = "the of and to is in that";\n'
        "// el que de la y los k@\nlet z@ = 3;\n"),
    2: ("go", "/* der und die das ist b@ */\nvar v@ = 1\n"),
    3: ("py", "a@ = 4\n"),
    4: ("js", "// zzz@ qqq\nlet w@ = 1;\n"),
}


def q_comment_lang(spark, sf_dir):
    """Per-repo comment-language mix
    (functions/embedded.comment_lang_mix): natural-language ID of the
    comment CHANNEL — the multilingual-curation signal for code (a
    text corpus balances by document language; a code corpus by the
    language its comments are written in).  Striped synthesis plants
    en/es/de/unknown comments plus a comment-free file per repo; the
    es stripe hides an English string literal that must NOT tint the
    verdict (strings mask before comment extraction)."""
    from schema_validator_spark.functions.embedded import (
        comment_lang_mix,
    )

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    lang, content = _tmpl_cols(_CMTLANG_TMPL, did % 5, did.cast("string"))
    df = docs.select(
        F.concat(F.lit("r"), (did % 7).cast("string")).alias("repo"),
        lang.alias("lang"),
        content.alias("content"),
    )
    return comment_lang_mix(df, "repo", "content", "lang")


def q_repo_debt(spark, sf_dir):
    """Repo-grain tech-debt rollup
    (operators/codequality.repo_debt): TODO/FIXME/HACK/XXX marker
    lines, token-boundary matched per \\n-split line with explicit
    engine-neutral char classes (see the module doc for why neither
    multiline `$` nor `.` nor `\\b` can appear), plus debt density per
    kline.  One zero-shuffle scan + one map-side-combinable repo
    groupBy."""
    from schema_validator_spark.operators.codequality import repo_debt

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    _, content = _tmpl_cols(_DEBT_TMPL, did % 4, did.cast("string"))
    df = docs.select(
        F.concat(F.lit("r"), (did % 7).cast("string")).alias("repo"),
        content.alias("content"),
    )
    return repo_debt(df, "repo", "content")


def q_unused_imports(spark, sf_dir):
    """Dead-import hygiene scan (functions/imports.unused_imports):
    declared bindings never referenced outside the import lines —
    flake8-F401/goimports tier, per-lang binding grammars (py
    import/from/as + comma lists, go alias + path-segment packages,
    js default/namespace/braces/require, java last-dotted-segment).
    One planted unused binding per stripe (two for go), every other
    binding used; zero shuffles."""
    from schema_validator_spark.functions.imports import unused_imports

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    lang, content = _tmpl_cols(_UNUSED_TMPL, did % 5, did.cast("string"))
    df = docs.select(
        did.alias("doc_id"), lang.alias("lang"), content.alias("content")
    )
    return unused_imports(df, ["doc_id"], "content", "lang")


def q_file_history(spark, sf_dir):
    """Commit-grain file-version churn
    (operators/history.churn_stats): per (repo, path) version count,
    distinct content states, first/last commit, head-version sha, and
    churn ratio — the "keep latest visible version" axis of the north
    rule's (repo, path, commit) table.  Synthesis: 7x31 key grid over
    doc_id (coprime -> ~n/217 versions per file), commit = doc_id
    (unique, monotone), content alternates between 2 per-key states so
    distinct < versions; every 41st doc NULL content (hashes as '')."""
    from schema_validator_spark.operators.history import churn_stats

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    content = F.when(did % 41 == 0, F.lit(None).cast("string")).otherwise(
        F.concat(
            F.lit("c"), (did % 217).cast("string"), F.lit("-"),
            (F.floor(did / 217) % 2).cast("string"),
        )
    )
    df = docs.select(
        F.concat(F.lit("r"), (did % 7).cast("string")).alias("repo"),
        F.concat(F.lit("p"), (did % 31).cast("string")).alias("path"),
        did.alias("commit"),
        content.alias("content"),
    )
    return churn_stats(df, ["repo", "path"], "commit", "content")


def q_edit_pairs(spark, sf_dir):
    """Consecutive-version diff mining (operators/history.edit_pairs):
    the CommitPack (before, after) pair extraction with set-based
    line-diff stats over the (repo, path, commit) axis.  Synthesis:
    the file_history 7x31 key grid; content is 3 lines (stable header
    'h<key>', 's'/'t' lines keyed to floor(t/2) so every even->odd
    step is byte-identical (changed=false) and every odd->even step
    swaps 2 of 3 lines); every 41st doc NULL (splits as one empty
    line).  Oracle: independent lag-window replay in DuckDB."""
    from schema_validator_spark.operators.history import edit_pairs

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    t2 = F.floor(did / 217 / 2)
    content = F.when(did % 41 == 0, F.lit(None).cast("string")).otherwise(
        F.concat(
            F.lit("h"), (did % 217).cast("string"), F.lit("\ns"),
            (t2 % 2).cast("string"), F.lit("\nt"),
            (t2 % 3).cast("string"),
        )
    )
    df = docs.select(
        F.concat(F.lit("r"), (did % 7).cast("string")).alias("repo"),
        F.concat(F.lit("p"), (did % 31).cast("string")).alias("path"),
        did.alias("commit"),
        content.alias("content"),
    )
    out = edit_pairs(df, ["repo", "path"], "commit", "content")
    return out.select(
        "repo", "path", "from_version", "to_version",
        F.col("n_added").cast("long").alias("n_added"),
        F.col("n_removed").cast("long").alias("n_removed"),
        F.col("n_common").cast("long").alias("n_common"),
        "line_jaccard", "changed",
    )


def q_commit_pairs(spark, sf_dir):
    """CommitPackFT instruction-pair mining
    (operators/history.commit_pairs): changed consecutive-version
    pairs scored by commit-message quality (subject length, letter
    content, merge/revert/bump/bot reject tiers — the OctoPack
    cleaning idea).  Synthesis: (repo=did%5, path=did%17) version
    grid; adjacent versions of a key differ by 85 in doc_id, and
    content flips with floor(did/170)%3 — every OTHER adjacent pair
    is a real edit, so the changed_only exclusion inside commit_pairs
    is exercised at driver scale; messages cycle 7 cases (good, ^merge,
    too-short, NULL, body Co-authored-by, Bumped-stem, good).
    Audit mode (quality_only=False) so the oracle checks the verdict
    itself.  Oracle: independent lag-window + regex replay (the
    reject regex is ASCII-boundary by construction — see
    MSG_REJECT_RE — so Java and RE2 agree)."""
    from schema_validator_spark.operators.history import commit_pairs

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    msg = (
        F.when(did % 7 == 0, F.lit("Fix the parser state machine"))
        .when(did % 7 == 1, F.lit("Merge branch 'main' into dev"))
        .when(did % 7 == 2, F.lit("fix"))
        .when(did % 7 == 3, F.lit(None).cast("string"))
        .when(did % 7 == 4,
              F.lit("Improve error reporting\n\n"
                    "Co-authored-by: bot <b@x>"))
        .when(did % 7 == 5, F.lit("Bumped version to 2.0"))
        .otherwise(F.lit("Add handling for empty import lists"))
    )
    df = docs.select(
        F.concat(F.lit("r"), (did % 5).cast("string")).alias("repo"),
        F.concat(F.lit("p"), (did % 17).cast("string")).alias("path"),
        did.alias("commit"),
        F.concat(
            F.lit("h\nc"), (F.floor(did / 170) % 3).cast("string")
        ).alias("content"),
        msg.alias("message"),
    )
    out = commit_pairs(
        df, ["repo", "path"], "commit", "content", "message",
        quality_only=False,
    )
    return out.select(
        "repo", "path", "from_version", "to_version", "message",
        F.col("n_added").cast("long").alias("n_added"),
        F.col("n_removed").cast("long").alias("n_removed"),
        F.col("n_common").cast("long").alias("n_common"),
        "line_jaccard", "msg_ok",
    )


def q_mixture_plan(spark, sf_dir):
    """Data-mixture planning (operators/sampling.mixture_plan): per-
    source sampling rate + epoch count for a token budget (the
    LLaMA/Pile mixture-table arithmetic).  Sources: documents.source
    remapped to 4 classes incl. one UNPLANNED class ('extra') and the
    plan names one GHOST source with no data — both audit rows must
    survive (never silently dropped).  Budget 10^6 tokens, weights
    1:2:5:2 (normalize to exact 6dp decimals).  The operator's NULL
    verdicts (excluded source / unsatisfiable plan) are coalesced to
    -1 sentinels on BOTH sides: the driver's pandas conversion turns
    a nullable numeric column into float64 NaN, which can never
    hash-match Spark's NULL.  Oracle: full-outer join replay of the
    same arithmetic."""
    from schema_validator_spark.operators.sampling import mixture_plan

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    src = F.when(
        did % 4 == 3, F.lit("extra")
    ).otherwise(F.concat(F.lit("src"), (did % 4).cast("string")))
    df = docs.select(
        src.alias("source"),
        F.octet_length("text").alias("n_tokens"),
    )
    out = mixture_plan(
        df, "source", "n_tokens",
        {"src0": 1.0, "src1": 2.0, "src2": 5.0, "ghost": 2.0},
        1_000_000,
    )
    neg1 = F.lit(-1.0)
    return out.select(
        "source", "n_docs", "n_tokens",
        F.coalesce(F.col("weight"), neg1).alias("weight"),
        F.coalesce(F.col("target_tokens"), F.lit(-1).cast("long"))
        .alias("target_tokens"),
        F.coalesce(F.col("sample_rate"), neg1).alias("sample_rate"),
        F.coalesce(F.col("epochs"), F.lit(-1).cast("int"))
        .alias("epochs"),
    )


def q_dead_symbols(spark, sf_dir):
    """Dead exported symbols (operators/deadcode.dead_symbols): public
    API never referenced outside its defining file(s), repo-scoped.
    Synthesis: py files on a (repo=did%13, class k=did%29) grid —
    each file defines s<k> and mentions s<(k+1)%29> UNLESS that class
    is ≡0 mod 4, so exactly the k%4==0 classes are dead in every repo
    (gcd(13,29)=1 ⇒ every (repo, class) has def and mention files).
    Oracle: independent DuckDB anti-join replay over the same regex
    constants."""
    from schema_validator_spark.operators.deadcode import dead_symbols

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    k = did % 29
    m = (k + 1) % 29
    content = F.concat(
        F.lit("def s"), k.cast("string"), F.lit("():\n    return 0\n"),
        F.when(
            m % 4 != 0,
            F.concat(F.lit("x = s"), m.cast("string"), F.lit("\n")),
        ).otherwise(F.lit("")),
    )
    df = docs.select(
        F.concat(F.lit("r"), (did % 13).cast("string")).alias("repo"),
        F.concat(F.lit("p"), did.cast("string")).alias("path"),
        F.lit("py").alias("lang"),
        content.alias("content"),
    )
    return dead_symbols(df, "repo", "path", "content", "lang")


def q_notebook_pairs(spark, sf_dir):
    """Jupyter (markdown, code) instruction pairs
    (functions/notebook.markdown_code_pairs — the StarCoder
    "Jupyter-structured" recipe): each code cell pairs with the run of
    markdown cells immediately preceding it, via ONE linear aggregate
    pass per notebook (zero shuffles).  Synthesis: a 2-md-run shape
    (cells join with a newline), a code-only shape, a raw-cell-resets
    shape, and a corrupt stripe; the oracle REPARSES the JSON in
    DuckDB and re-derives the pairing independently as
    gaps-and-islands + an end-index join."""
    from schema_validator_spark.functions.notebook import (
        markdown_code_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    i = (did % 50).cast("string")
    js = (
        F.when(did % 29 == 0, F.lit("not a notebook {"))
        .when(
            did % 3 == 0,
            F.concat(
                F.lit('{"cells": [{"cell_type": "markdown", "source": '
                      '["# t'), i,
                F.lit('\\n"]}, {"cell_type": "markdown", "source": '
                      '["ctx'), i,
                F.lit('"]}, {"cell_type": "code", "source": ["x = '), i,
                F.lit('\\n", "y = '), i,
                F.lit('"]}, {"cell_type": "code", "source": ["z = '), i,
                F.lit('"]}]}'),
            ),
        )
        .when(
            did % 3 == 1,
            F.concat(
                F.lit('{"cells": [{"cell_type": "code", "source": '
                      '["a = '), i, F.lit('"]}]}'),
            ),
        )
        .otherwise(
            F.concat(
                F.lit('{"cells": [{"cell_type": "markdown", "source": '
                      '["ctx'), i,
                F.lit('"]}, {"cell_type": "raw", "source": ["r"]}, '
                      '{"cell_type": "code", "source": ["b = '), i,
                F.lit('"]}]}'),
            ),
        )
    )
    df = docs.select(F.col("doc_id"), js.alias("content"))
    return markdown_code_pairs(df, ["doc_id"], "content")


#: nlpl_pairs synthesis templates, single-sourced for the oracle via
#: _duck_lit: stripe -> (prefix, suffix) around the doc_id insertion.
#: Every unit ends with \n; the lead chunk the chunker produces is the
#: unit WITHOUT its trailing newline (the next unit's def line follows).
#: Stripes: plain def + multi-line triple-double docstring (k in doc);
#: decorated async def + triple-single (k in func NAME); raw-prefix
#: docstring; def with no docstring (no pair); a Go file (lang-filtered).
_NLPL_TMPL: dict[int, tuple[str, str]] = {
    0: ('def f(a, b):\n    """Sum ', '.\n\n    More text."""\n'
        '    return a + b\n'),
    1: ("@cached\nasync def g", "(x):\n    '''doc g'''\n    return x\n"),
    2: ('def h():\n    r"""raw ', ' doc"""\n    pass\n'),
    3: ("def nodoc():\n    return ", "\n"),
    4: ("func F", "() {}\n"),
}
_NLPL_TAIL = "def tail(y):\n    return y\n"


def _nlpl_synth(docs):
    """Shared (doc_id, lang, content) synthesis for q_nlpl_pairs and
    q_docstring_coverage — both oracles reconstruct these exact
    chunks, so the synthesis must exist exactly once."""
    did = F.col("doc_id")
    m = did % 5
    k = did.cast("string")

    def _unit(i):
        p, s = _NLPL_TMPL[i]
        return F.concat(F.lit(p), k, F.lit(s))

    unit0 = (
        F.when(m == 0, _unit(0)).when(m == 1, _unit(1))
        .when(m == 2, _unit(2)).when(m == 3, _unit(3))
        .otherwise(_unit(4))
    )
    content = F.when(m == 4, unit0).otherwise(
        F.concat(unit0, F.lit(_NLPL_TAIL))
    )
    lang = F.when(m == 4, F.lit("go")).otherwise(F.lit("py"))
    return docs.select(
        "doc_id", lang.alias("lang"), content.alias("content")
    )


def q_nlpl_pairs(spark, sf_dir):
    """NL-PL (docstring, function) pair extraction
    (operators/docpairs.extract_nlpl_pairs = lang filter ->
    chunk_functions -> anchored docstring regexes): the CodeSearchNet
    training-data construction step.  Each py file = one striped unit
    + a docstring-less tail function, so exactly the three docstring
    stripes pair (chunk_idx pins positions, chunk_sha pins the chunk
    text byte-exactly — an end-to-end check on the chunker too)."""
    from schema_validator_spark.operators.docpairs import (
        extract_nlpl_pairs,
    )

    df = _nlpl_synth(_t(spark, sf_dir, "documents"))
    return extract_nlpl_pairs(df, ["doc_id"], "content", "lang")


def q_entropy_secrets(spark, sf_dir):
    """High-entropy string findings (operators/secrets.entropy_findings
    — the truffleHog tier behind the pattern scan).  Stripes: planted
    32-char md5-derived hex tokens (entropy ~3.8, random per doc),
    zero-entropy and 1.58-bit repetitive fillers, and a no-candidate
    row; threshold 3.0 sits >=1.4 bits from every planted class, so an
    engine ulp can never flip a verdict.  The oracle computes entropy
    RELATIONALLY (unnest chars -> group -> -sum(p*log2 p)) — an
    independent derivation of the same quantity the codegen HOF chain
    produces, compared as 6dp-scaled longs."""
    from schema_validator_spark.operators.secrets import (
        entropy_findings,
    )

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    k = did.cast("string")
    m = did % 4
    content = (
        F.when(m == 0, F.concat(
            F.lit('token = "'),
            F.substring(F.md5(k), 1, 16),
            F.substring(F.md5(F.concat(F.lit("x"), k)), 1, 16),
            F.lit('"'),
        ))
        .when(m == 1, F.lit('name = "aaaaaaaaaaaaaaaaaaaaaaaa"'))
        .when(m == 2, F.lit('v = "abcabcabcabcabcabcabcabc"'))
        .otherwise(F.lit('short = "aK9z"'))
    )
    df = docs.select("doc_id", content.alias("content"))
    return entropy_findings(df, ["doc_id"], "content", threshold=3.0)


def _entropy_secrets_oracle_sql() -> str:
    """Relational replay of q_entropy_secrets from the SAME candidate
    pattern (secrets.ENTROPY_CANDIDATE): synthesize the striped
    corpus, explode distinct candidate runs, explode characters, and
    aggregate -sum(p*log2 p) per token."""
    from schema_validator_spark.operators.secrets import (
        ENTROPY_CANDIDATE,
    )

    return f"""
      with synth as (
        select doc_id,
               case when doc_id % 4 = 0 then
                      'token = "'
                      || substr(md5(cast(doc_id as varchar)), 1, 16)
                      || substr(md5('x' || cast(doc_id as varchar)), 1, 16)
                      || '"'
                    when doc_id % 4 = 1 then
                      'name = "aaaaaaaaaaaaaaaaaaaaaaaa"'
                    when doc_id % 4 = 2 then
                      'v = "abcabcabcabcabcabcabcabc"'
                    else 'short = "aK9z"' end as content
        from documents
      ), toks as (
        select doc_id, unnest(list_distinct(regexp_extract_all(
                 content, '{_esc_sq(ENTROPY_CANDIDATE)}'))) as token
        from synth
      ), ch as (
        select doc_id, token, length(token) as L,
               substring(token, i, 1) as c
        from (select doc_id, token,
                     unnest(generate_series(1, length(token))) as i
              from toks)
      ), freq as (
        select doc_id, token, L, c, count(*) as n
        from ch group by 1, 2, 3, 4
      ), ent as (
        select doc_id, token, cast(L as bigint) as token_len,
               sum(-(n / cast(L as double))
                   * log2(n / cast(L as double))) as entropy
        from freq group by 1, 2, 3
      )
      select doc_id, token, token_len, entropy
      from ent where entropy >= 3.0
    """


def q_api_diff(spark, sf_dir):
    """API-surface breaking-change diff across two snapshots
    (functions/publicapi.api_diff — the code-table analog of the
    schema-evolution gate).  Synthesis: every doc exports one UNIQUE
    symbol f{doc_id}; the new snapshot renames it to g{doc_id} when
    doc_id % 11 == 0, so each rename must surface as exactly one
    removed + one added row.  The oracle derives the expected set
    ARITHMETICALLY from the stripes — fully independent of the
    extraction regexes it checks."""
    from schema_validator_spark.functions.publicapi import api_diff

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    k = did.cast("string")
    repo = F.concat(F.lit("r"), (did % 20).cast("string"))

    def snap(sym):
        return docs.select(
            repo.alias("repo"),
            F.lit("py").alias("lang"),
            F.concat(F.lit("def "), sym, F.lit("():\n    pass\n")).alias(
                "content"
            ),
        )

    old = snap(F.concat(F.lit("f"), k))
    new = snap(
        F.when(did % 11 == 0, F.concat(F.lit("g"), k)).otherwise(
            F.concat(F.lit("f"), k)
        )
    )
    return api_diff(old, new, "repo", "content", "lang")


_API_DIFF_ORACLE_SQL = """
  select 'r' || cast(doc_id % 20 as varchar) as repo, 'py' as lang,
         'f' || cast(doc_id as varchar) as symbol,
         'removed' as change
  from documents where doc_id % 11 = 0
  union all
  select 'r' || cast(doc_id % 20 as varchar), 'py',
         'g' || cast(doc_id as varchar), 'added'
  from documents where doc_id % 11 = 0
"""


def q_docstring_coverage(spark, sf_dir):
    """Per-repo documentation coverage
    (operators/docpairs.docstring_coverage): share of Python function
    chunks carrying a docstring — same _NLPL_TMPL synthesis as
    q_nlpl_pairs (each py file = one striped unit + an undocumented
    tail) spread over 10 repos, so every repo mixes documented,
    undocumented, and lang-filtered files."""
    from schema_validator_spark.operators.docpairs import (
        docstring_coverage,
    )

    df = _nlpl_synth(_t(spark, sf_dir, "documents")).select(
        F.concat(
            F.lit("r"), (F.col("doc_id") % 10).cast("string")
        ).alias("repo"),
        "lang",
        "content",
    )
    return docstring_coverage(df, "repo", "content", "lang")


#: unsafe_apis synthesis templates (stripe -> (lang, prefix, suffix)
#: around the doc_id insertion), single-sourced for the oracle via
#: _duck_lit.  Stripes: py with eval+pickle, py clean (evaluate() must
#: not \b-match), js eval+innerHTML, c strcpy/strcat/system, go
#: unsafe.Pointer, and an UNREGISTERED lang (rb) with eval( — no claim.
_UNSAFE_TMPL: dict[int, tuple[str, str, str]] = {
    0: ("py", "import pickle\nx = eval(src",
        ")\ny = pickle.loads(data)\n"),
    1: ("py", "def ok", "():\n    return evaluate(x)\n"),
    2: ("js", "eval(s", "); el.innerHTML = html;\n"),
    3: ("c", "strcpy(a, b", "); strcat(a, c); system(cmd);\n"),
    4: ("go", "p := unsafe.Pointer(&x", ")\n"),
    5: ("rb", "eval(x", ")\n"),
}


def q_unsafe_apis(spark, sf_dir):
    """Unsafe-API usage findings
    (operators/unsafe.unsafe_findings): Bandit/Semgrep-class audit of
    dangerous call sites (code injection, unsafe deserialization,
    shell exec, unsafe C string functions) — per-lang lazy regex
    counts, one stack-unpivot, row-level (file, class, span-count)
    findings."""
    from schema_validator_spark.operators.unsafe import unsafe_findings

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    m = did % 6
    k = did.cast("string")
    lang = content = None
    for i, (lg, p, s) in sorted(_UNSAFE_TMPL.items()):
        cond = m == i
        body = F.concat(F.lit(p), k, F.lit(s))
        lg_lit = F.lit(lg)
        lang = F.when(cond, lg_lit) if lang is None else lang.when(
            cond, lg_lit
        )
        content = F.when(cond, body) if content is None else content.when(
            cond, body
        )
    df = docs.select(
        "doc_id", lang.alias("lang"), content.alias("content")
    )
    return unsafe_findings(df, ["doc_id"], "content", "lang")


def q_manifest_deps(spark, sf_dir):
    """Dependency-manifest extraction
    (operators/manifests.manifest_deps): declared dependencies from
    pip requirements.txt (comment/option lines excluded), go.mod
    (require lines incl. blocks; the module self-declaration never
    matches), and package.json (JSON-parsed, runtime vs dev kinds;
    malformed JSON -> zero deps, never an error — every 37th npm doc
    is malformed).  Stripe 3 is a non-manifest file: no rows."""
    from schema_validator_spark.operators.manifests import manifest_deps

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    m = did % 4
    k = did.cast("string")
    path = (
        F.when(m == 0, F.lit("requirements.txt"))
        .when(m == 1, F.lit("go.mod"))
        .when(m == 2, F.lit("web/package.json"))
        .otherwise(F.lit("src/main.py"))
    )
    pip = F.concat(
        F.lit("pkg"), k, F.lit(">=1.0\n# c\nnumpy\n-r base.txt\n")
    )
    gomod = F.concat(
        F.lit("module m"), k,
        F.lit("\nrequire (\n\tgithub.com/a/b"), k,
        F.lit(" v1.2.3\n)\n"),
    )
    npm = F.concat(
        F.lit('{"dependencies": {"react": "^18", "p'), k,
        F.lit('": "1"}, "devDependencies": {"jest": "^29"}}'),
    )
    content = (
        F.when(m == 0, pip)
        .when(m == 1, gomod)
        .when(
            m == 2,
            F.when(did % 37 == 0, F.lit("{bad")).otherwise(npm),
        )
        .otherwise(F.lit("import os\n"))
    )
    df = docs.select(
        "doc_id", path.alias("path"), content.alias("content")
    )
    return manifest_deps(df, ["doc_id"], "path", "content")


#: public_api synthesis templates (stripe -> (lang, prefix, suffix)
#: around the doc_id insertion) — the insertion lands INSIDE the first
#: exported symbol name so every doc exports distinct symbols; each
#: stripe also plants a non-exported decl (underscore py, lowercase
#: go, unexported js, package-private java) that must NOT extract.
_API_TMPL: dict[int, tuple[str, str, str]] = {
    0: ("py", "def handler",
        "(x):\n    pass\n\ndef _hidden():\n    pass\n"
        "class Model:\n    pass\n"),
    1: ("go", "func Do",
        "() {}\nfunc helper() {}\ntype Conf struct {}\n"),
    2: ("js", "export function run",
        "() {}\nexport const VALUE = 1\nfunction priv() {}\n"),
    3: ("java", "public class W",
        " {}\nclass PackagePrivate {}\n"),
    4: ("cobol", "PROCEDURE DIVISION", ".\n"),
}


def q_public_api(spark, sf_dir):
    """Public-API symbol extraction
    (functions/publicapi.extract_public_symbols): each file's exported
    surface per the lang's visibility convention (py non-underscore
    top-level, go capitalization incl. receivers, js export
    declarations, java public types; unregistered cobol exports
    nothing)."""
    from schema_validator_spark.functions.publicapi import (
        extract_public_symbols,
    )

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    m = did % 5
    k = did.cast("string")
    lang = content = None
    for i, (lg, p, s) in sorted(_API_TMPL.items()):
        cond = m == i
        body = F.concat(F.lit(p), k, F.lit(s))
        lg_lit = F.lit(lg)
        lang = F.when(cond, lg_lit) if lang is None else lang.when(
            cond, lg_lit
        )
        content = F.when(cond, body) if content is None else content.when(
            cond, body
        )
    df = docs.select(
        "doc_id", lang.alias("lang"), content.alias("content")
    )
    return extract_public_symbols(df, ["doc_id"], "content", "lang")


def q_test_mapping(spark, sf_dir):
    """Source-to-test pairing by naming convention
    (operators/testmap.source_test_mapping): per-repo tested/untested
    source counts, orphan tests, coverage.  Synthesis: docs grouped in
    fives sharing a stem pool (g = doc_id//5, s = g%50) so pairings
    are deterministic — py prefix tests (every 3rd group replaced by
    an extra untested source), go suffix tests (every 4th group an
    orphan), and a .test.js stripe whose sources never exist
    (suffix-parse + orphan path)."""
    from schema_validator_spark.operators.testmap import (
        source_test_mapping,
    )

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    m = did % 5
    g = F.floor(did / 5).cast("long")
    s = (g % 50).cast("string")
    path = (
        F.when(m == 0, F.concat(F.lit("src/m"), s, F.lit(".py")))
        .when(
            m == 1,
            F.when(
                g % 3 == 0,
                F.concat(F.lit("src/extra"), s, F.lit(".py")),
            ).otherwise(
                F.concat(F.lit("tests/test_m"), s, F.lit(".py"))
            ),
        )
        .when(m == 2, F.concat(F.lit("pkg/n"), s, F.lit(".go")))
        .when(
            m == 3,
            F.when(
                g % 4 == 0,
                F.concat(F.lit("tests/orphan"), s, F.lit("_test.go")),
            ).otherwise(
                F.concat(F.lit("pkg/n"), s, F.lit("_test.go"))
            ),
        )
        .otherwise(F.concat(F.lit("web/c"), s, F.lit(".test.js")))
    )
    df = docs.select(
        F.concat(F.lit("r"), (g % 7).cast("string")).alias("repo"),
        path.alias("path"),
    )
    return source_test_mapping(df, "repo", "path")


#: lang_detect synthesis (stripe -> (declared lang, prefix, suffix)):
#: correct py/js declarations (no report), wrong go/c declarations
#: (keyword-vote mismatches), a bash shebang overriding python
#: keywords, unknown content (not reported), and a declared lang
#: outside the detector vocabulary (not reported).
_LANGDET_TMPL: dict[int, tuple[str, str, str]] = {
    0: ("py", "def f", "(x):\n    return self.x\nimport os\n"),
    1: ("go", "def g", "(x):\n    return self.x\nimport os\n"),
    2: ("js", "const v", " = () => {\n  console.log('x')\n}\n"),
    3: ("py", "#!/bin/bash\n# job ", "\ndef f(x):\n    return self.x\n"),
    4: ("c", "public class W",
        " {\n  public static void main() {\n"
        "    System.out.println();\n  }\n}\n"),
    5: ("py", "PROCEDURE DIVISION ", ".\n"),
    6: ("cobol", "package m", "\nfunc main() {\n\tx := 1\n}\n"),
}


def q_lang_detect(spark, sf_dir):
    """Content-based language detection, consistency form
    (operators/langdetect.lang_consistency): shebang tier + per-lang
    keyword vote vs the declared lang — rows where the content
    contradicts the metadata.  Expected reports: go-declared python
    (stripe 1), shebang bash under a py declaration (stripe 3),
    c-declared java (stripe 4)."""
    from schema_validator_spark.operators.langdetect import (
        lang_consistency,
    )

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    m = did % 7
    k = did.cast("string")
    lang = content = None
    for i, (lg, p, s) in sorted(_LANGDET_TMPL.items()):
        cond = m == i
        body = F.concat(F.lit(p), k, F.lit(s))
        lg_lit = F.lit(lg)
        lang = F.when(cond, lg_lit) if lang is None else lang.when(
            cond, lg_lit
        )
        content = F.when(cond, body) if content is None else content.when(
            cond, body
        )
    df = docs.select(
        "doc_id", lang.alias("lang"), content.alias("content")
    )
    return lang_consistency(df, ["doc_id"], "content", "lang")
