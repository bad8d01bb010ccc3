from __future__ import annotations

import pytest

from schema_validator_spark.operators.langdetect import (
    KEYWORD_SIGNALS,
    SHEBANG_RULES,
    detect_lang,
    lang_consistency,
)

SCHEMA = "doc_id int, lang string, content string"


def _detect(spark, contents):
    df = spark.createDataFrame(
        [(i, None, c) for i, c in enumerate(contents)], SCHEMA
    )
    rows = df.select("doc_id", detect_lang("content").alias("d")).collect()
    return [r["d"] for r in sorted(rows, key=lambda r: r["doc_id"])]


def test_keyword_votes(spark):
    got = _detect(spark, [
        "def handler(x):\n    if x:\n        return self.y\nimport os\n",
        "package main\n\nfunc main() {\n\tx := 1\n}\n",
        "const app = () => {\n  console.log('hi')\n}\n",
        "public class A {\n  public static void main() {\n"
        "    System.out.println();\n  }\n}\n",
        '#include <stdio.h>\nvoid run(void) { printf("x"); }\n',
        "PROCEDURE DIVISION.\n",
        None,
    ])
    assert got == ["py", "go", "js", "java", "c", "unknown", "unknown"]


def test_shebang_overrides_keywords(spark):
    # body votes go, shebang says python — shebang wins
    got = _detect(spark, [
        "#!/usr/bin/env python3\nfunc main() { x := 1 }\n",
        "#!/bin/bash\necho hi\n",
        "#!/usr/bin/env node\nlet x = 1\n",
        "x = 1  #!/usr/bin/env python\n",     # not at file start: no tier
    ])
    assert got[:3] == ["py", "sh", "js"]
    assert got[3] == "unknown"


def test_tie_breaks_by_lang_name(spark):
    # exactly one vote each for c and go -> deterministic max lang name
    got = _detect(spark, ["#include <x>\nfunc \n"])
    assert got == ["go"]


def test_lang_consistency(spark):
    rows = [
        (1, "go", "def f(x):\n    return self.x\nimport os\n"),  # wrong
        (2, "py", "def f(x):\n    return self.x\nimport os\n"),  # right
        (3, "py", "PROCEDURE DIVISION.\n"),      # unknown: not reported
        (4, "cobol", "func main() { x := 1 }\npackage m\n"),
        # declared outside vocabulary: not reported
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = lang_consistency(df, ["doc_id"], "content", "lang").collect()
    assert [(r["doc_id"], r["declared_lang"], r["detected_lang"])
            for r in got] == [(1, "go", "py")]


def test_merge_signals_matches_per_pattern(spark):
    # the merged per-lang alternation detects identically to exact
    # per-pattern sums on realistic code (overlapping same-lang signal
    # spans are the only divergence source — "def elif" scores 1 not 2
    # merged, but the arg-max winner is unchanged: no other lang gains)
    contents = [
        "def handler(x):\n    return self.y\nimport os\n",
        "package main\n\nfunc main() {\n\tx := 1\n}\n",
        "const app = () => {\n  console.log('hi')\n}\n",
        "public class A {\n  public static void main() {} }\n",
        '#include <stdio.h>\nvoid run(void) { printf("x"); }\n',
        "def elif_handler(x): pass\n",   # adjacent py signals
        "def elif\n",                    # overlapping py signal spans
        "#!/usr/bin/env python3\nfunc main() { x := 1 }\n",
        "", None,
    ]
    df = spark.createDataFrame(
        [(i, None, c) for i, c in enumerate(contents)], SCHEMA
    )
    got = df.select(
        detect_lang("content").alias("m"),
        detect_lang("content", merge_signals=False).alias("p"),
    ).collect()
    assert [r["m"] for r in got] == [r["p"] for r in got]


def test_validation_and_zero_shuffle(spark):
    with pytest.raises(ValueError, match="empty keyword-signal"):
        detect_lang("c", signals={})
    assert [lg for lg, _ in SHEBANG_RULES][:2] == ["py", "js"]
    assert set(KEYWORD_SIGNALS) == {"py", "go", "js", "java", "c"}

    from schema_validator_spark.plans.inspect import n_exchanges

    df = spark.createDataFrame([(1, "py", "def f(): pass")], SCHEMA)
    assert n_exchanges(
        lang_consistency(df, ["doc_id"], "content", "lang")
    ) == 0
