"""i18n message rendering (i18n/translator.go:77-90 analog)."""

from __future__ import annotations

from pyspark.sql import functions as F

from schema_validator_spark import ValidationEngine
from schema_validator_spark.i18n import CATALOGS, message_column, translate


def test_translate_positional_params():
    # TranslateError maps params to Arg1.. (translator.go:80-88)
    assert translate("min", path="age", params="8") == "Must be at least 8"
    assert translate("oneof", params="a,b,c") == "Must be one of: a,b,c"
    assert translate("required_if", params="Type,admin") == "Required when Type is admin"


def test_translate_fallbacks():
    # unknown code -> err.Error()-style fallback (translator.go:89-92)
    assert translate("nope_rule") == "nope_rule check failed"
    # unknown lang -> default-language catalog (go-i18n behavior)
    assert translate("required", lang="fr-FR") == "This field is required"
    # zh catalog
    assert translate("required", lang="zh-CN") == "该字段为必填项"
    assert translate("min", params="8", lang="zh-CN") == "最小值为 8"
    # zh-CN is now a complete catalog (parity pinned below); a code absent
    # from BOTH catalogs still falls through zh -> en -> generic
    assert translate("semver", lang="zh-CN") == "必须是有效的语义化版本号"
    assert translate("nope_rule", lang="zh-CN") == "nope_rule check failed"


def test_catalog_covers_default_registry():
    from schema_validator_spark.registry import default_registry

    reg = default_registry()
    missing = [name for name in reg.names() if name not in CATALOGS["en"]
               and name != "dive"]
    assert missing == [], f"en catalog missing messages for: {missing}"


def test_message_column_on_violations(spark):
    df = spark.createDataFrame(
        [(1, "", 30), (2, "bob", 200)], "id long, name string, age long"
    )
    eng = ValidationEngine(
        {"name": "required|min=3", "age": "max=150"}, key_cols=["id"]
    )
    v = eng.run(df).violations.withColumn("message", message_column("en"))
    got = {(r["id"], r["code"]): r["message"] for r in v.collect()}
    assert got[(1, "required")] == "This field is required"
    assert got[(1, "min")] == "Must be at least 3"
    assert got[(2, "max")] == "Must be at most 150"

    zh = eng.run(df).violations.withColumn("message", message_column("zh-CN"))
    gotz = {(r["id"], r["code"]): r["message"] for r in zh.collect()}
    assert gotz[(1, "required")] == "该字段为必填项"
    assert gotz[(2, "max")] == "最大值为 150"


def test_message_column_is_pure_expression(spark):
    # no Python in the executor path: plan must not contain a PythonUDF node
    df = spark.createDataFrame([(1, "f", "min", "3")],
                               "id long, field string, code string, params string")
    plan = df.withColumn("m", message_column())._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_result_introspection_api(spark):
    """HasFieldError / HasErrorCode / Translate analogs (error.go:65-93)."""
    df = spark.createDataFrame([(1, "", 30)], "id long, name string, age long")
    res = ValidationEngine({"name": "required", "age": "max=150"},
                           key_cols=["id"]).run(df)
    assert res.has_field_error("name")
    assert not res.has_field_error("age")
    assert res.has_error_code("required")
    assert not res.has_error_code("max")
    t = res.translated("zh-CN").collect()
    assert t[0]["message"] == "该字段为必填项"


def test_zh_catalog_full_parity():
    """zh-CN covers every code en covers, and both cover every registered
    rule (the reference ships complete catalogs for both languages —
    i18n/msg.en.yaml + msg.zh-CN.yaml; fallback never fires for a
    registered rule in either)."""
    from schema_validator_spark.i18n import _EN, _ZH, translate
    from schema_validator_spark.registry import default_registry

    assert set(_ZH) == set(_EN)
    names = set(default_registry().names())
    missing_en = names - set(_EN)
    missing_zh = names - set(_ZH)
    assert not missing_en, missing_en
    assert not missing_zh, missing_zh
    # rendering sanity for a format-family code in both langs
    assert translate("ipv4", lang="en") == "Must be a valid IPv4 address"
    assert translate("ipv4", lang="zh-CN") == "必须是有效的IPv4 地址"
