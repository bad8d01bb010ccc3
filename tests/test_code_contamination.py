from __future__ import annotations

from schema_validator_spark.operators import decontaminate as D

SCHEMA = "doc_id long, lang string, content string"

# a "benchmark solution" and a renamed/re-literaled paste of it: the
# type-2 normal forms are identical, the raw texts share no 4-gram
EVAL_FN = (
    "def solve(n):\n"
    "    total = 0\n"
    "    for i in range(n):\n"
    "        total += i * 2\n"
    "    return total\n"
)
RENAMED = (
    "def accumulate(count):\n"
    "    acc = 99\n"
    "    for idx in range(count):\n"
    "        acc += idx * 777\n"
    "    return acc  # pasted\n"
)
CLEAN = (
    'names = [w for w in words if w]\n'
    'print(len(names), "ok")\n'
)


def _frames(spark):
    train = spark.createDataFrame(
        [
            (0, "py", RENAMED),
            (1, "py", CLEAN),
            (2, "py", EVAL_FN + CLEAN),  # partial: solution + extra code
            (3, "py", "# comment only\n"),
        ],
        SCHEMA,
    )
    eval_df = spark.createDataFrame([(100, "py", EVAL_FN)], SCHEMA)
    return train, eval_df


def test_renamed_copy_flagged_full_share(spark):
    train, eval_df = _frames(spark)
    got = {
        r["doc_id"]: r
        for r in D.code_contamination(
            train, eval_df, ["doc_id"], k=6
        ).collect()
    }
    assert 0 in got and got[0]["share"] == 1.0
    assert got[0]["n_shared"] == got[0]["n_grams"]
    # the raw-text sweep misses the rename entirely
    raw = D.ngram_contamination(
        train.withColumnRenamed("content", "text"),
        eval_df.withColumnRenamed("content", "text"),
        k=4,
    ).collect()
    assert 0 not in {r["doc_id"] for r in raw}


def test_partial_copy_partial_share(spark):
    train, eval_df = _frames(spark)
    got = {
        r["doc_id"]: r
        for r in D.code_contamination(
            train, eval_df, ["doc_id"], k=6
        ).collect()
    }
    assert 2 in got
    assert 0 < got[2]["share"] < 1.0
    # every eval gram appears in the superset file
    assert got[2]["n_shared"] == got[0]["n_grams"]


def test_clean_and_empty_not_flagged(spark):
    train, eval_df = _frames(spark)
    ids = {
        r["doc_id"]
        for r in D.code_contamination(
            train, eval_df, ["doc_id"], k=6
        ).collect()
    }
    assert ids == {0, 2}
    # comment-only eval docs contribute nothing: a comment-only train
    # file can never match a vacuous empty-normal gram
    ev2 = eval_df.union(
        eval_df.sparkSession.createDataFrame(
            [(101, "py", "# just a comment\n")], SCHEMA
        )
    )
    ids2 = {
        r["doc_id"]
        for r in D.code_contamination(
            train, ev2, ["doc_id"], k=6
        ).collect()
    }
    assert ids2 == {0, 2}


def test_min_shared_and_decontaminate_code(spark):
    train, eval_df = _frames(spark)
    flagged = D.code_contamination(
        train, eval_df, ["doc_id"], k=6
    )
    hi = D.code_contamination(
        train, eval_df, ["doc_id"], k=6, min_shared=10**6
    )
    assert hi.count() == 0
    clean = D.decontaminate_code(train, eval_df, ["doc_id"], k=6)
    kept = {r["doc_id"] for r in clean.collect()}
    assert kept == {1, 3}
    assert kept | {r["doc_id"] for r in flagged.collect()} == {0, 1, 2, 3}
