"""Localized violation messages (i18n/translator.go:77-90 re-expressed).

The reference renders ``code + positional Arg1..N`` through go-i18n YAML
catalogs (i18n/msg.en.yaml, msg.zh-CN.yaml) on demand per error.  Here the
catalog is a plain dict ``code -> template`` with ``{path}``, ``{params}``,
``{p1}``, ``{p2}`` placeholders, and rendering happens either

* driver-side — ``translate(code, path, params, lang)`` for single rows, or
* JVM-side — ``message_column(lang)`` adds a rendered ``message`` column to
  a violations DataFrame (map-literal lookup + string replace; no Python
  in the executor path, so it composes with the single-pass plan).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# -- catalogs ---------------------------------------------------------------

# "Must be a valid X" family: all regex/parse format rules share one shape.
_FORMAT_NAMES_EN = {
    "email": "email address", "base64": "base64 string",
    "base64url": "base64url string", "base64rawurl": "raw base64url string",
    "bic": "BIC", "bic_iso_9362_2014": "BIC (ISO 9362:2014)",
    "bcp47_language_tag": "BCP 47 language tag",
    "btc_addr": "Bitcoin address", "btc_addr_bech32": "Bech32 Bitcoin address",
    "credit_card": "credit card number", "mongodb": "MongoDB ObjectID",
    "mongodb_connection_string": "MongoDB connection string",
    "cron": "cron expression", "spicedb": "SpiceDB identifier",
    "datetime": "datetime", "e164": "E.164 phone number", "ein": "EIN",
    "eth_addr": "Ethereum address", "hexadecimal": "hexadecimal string",
    "hexcolor": "hex color", "hsl": "HSL color", "hsla": "HSLA color",
    "html": "HTML fragment", "html_encoded": "HTML-encoded string",
    "isbn": "ISBN", "isbn10": "ISBN-10", "isbn13": "ISBN-13", "issn": "ISSN",
    "iso3166_1_alpha2": "ISO 3166-1 alpha-2 country code",
    "iso3166_1_alpha3": "ISO 3166-1 alpha-3 country code",
    "iso3166_1_alpha_numeric": "ISO 3166-1 numeric country code",
    "iso3166_2": "ISO 3166-2 code", "iso4217": "ISO 4217 currency code",
    "json": "JSON document", "jwt": "JWT", "latitude": "latitude",
    "longitude": "longitude", "luhn_checksum": "Luhn checksum",
    "postcode_iso3166_alpha2": "postal code",
    "postcode_iso3166_alpha2_field": "postal code",
    "rgb": "RGB color", "rgba": "RGBA color", "ssn": "SSN",
    "timezone": "IANA timezone", "uuid": "UUID", "uuid3": "UUIDv3",
    "uuid4": "UUIDv4", "uuid5": "UUIDv5", "uuid_rfc4122": "RFC 4122 UUID",
    "uuid3_rfc4122": "RFC 4122 UUIDv3", "uuid4_rfc4122": "RFC 4122 UUIDv4",
    "uuid5_rfc4122": "RFC 4122 UUIDv5",
    "md4": "MD4 hash", "md5": "MD5 hash", "sha256": "SHA-256 hash",
    "sha384": "SHA-384 hash", "sha512": "SHA-512 hash",
    "ripemd128": "RIPEMD-128 hash", "ripemd160": "RIPEMD-160 hash",
    "tiger128": "TIGER-128 hash", "tiger160": "TIGER-160 hash",
    "tiger192": "TIGER-192 hash", "semver": "semantic version",
    "ulid": "ULID", "cve": "CVE identifier",
    "cidr": "CIDR notation", "cidrv4": "IPv4 CIDR notation",
    "cidrv6": "IPv6 CIDR notation", "datauri": "data URI",
    "fqdn": "FQDN", "hostname": "hostname",
    "hostname_rfc1123": "RFC 1123 hostname", "hostname_port": "host:port",
    "ip": "IP address", "ip_addr": "IP address", "ipv4": "IPv4 address",
    "ip4_addr": "IPv4 address", "ipv6": "IPv6 address",
    "ip6_addr": "IPv6 address", "mac": "MAC address",
    "tcp_addr": "TCP address", "tcp4_addr": "TCPv4 address",
    "tcp6_addr": "TCPv6 address", "udp_addr": "UDP address",
    "udp4_addr": "UDPv4 address", "udp6_addr": "UDPv6 address",
    "unix_addr": "Unix socket address", "uds_exists": "existing Unix socket",
    "uri": "URI", "url": "URL", "http_url": "HTTP URL",
    "https_url": "HTTPS URL", "url_encoded": "URL-encoded string",
    "urn_rfc2141": "RFC 2141 URN", "boolean": "boolean string",
    "image": "image file path", "dirpath": "directory path",
    "filepath": "file path", "dir": "existing directory",
    "file": "existing file",
}

_EN: dict[str, str] = {
    "required": "This field is required",
    "min": "Must be at least {p1}",
    "max": "Must be at most {p1}",
    "len": "Length must be exactly {p1}",
    "oneof": "Must be one of: {params}",
    "eq": "Must be equal to {p1}",
    "eq_ignore_case": "Must be equal to {p1} (case-insensitive)",
    "ne": "Must not be equal to {p1}",
    "ne_ignore_case": "Must not be equal to {p1} (case-insensitive)",
    "gt": "Must be greater than {p1}",
    "gte": "Must be at least {p1}",
    "lt": "Must be less than {p1}",
    "lte": "Must be at most {p1}",
    "eqfield": "Must be equal to {p1}",
    "nefield": "Must not be equal to {p1}",
    "gtfield": "Must be greater than {p1}",
    "ltfield": "Must be less than {p1}",
    "gtefield": "Must be at least {p1}",
    "ltefield": "Must be at most {p1}",
    "fieldcontains": "Must contain the value of {p1}",
    "fieldexcludes": "Must not contain the value of {p1}",
    "required_if": "Required when {p1} is {p2}",
    "required_unless": "Required unless {p1} is {p2}",
    "required_with": "Required when {params} is present",
    "required_with_all": "Required when all of {params} are present",
    "required_without": "Required when {params} is absent",
    "required_without_all": "Required when all of {params} are absent",
    "excluded_if": "Must be empty when {p1} is {p2}",
    "excluded_unless": "Must be empty unless {p1} is {p2}",
    "excluded_with": "Must be empty when {params} is present",
    "excluded_with_all": "Must be empty when all of {params} are present",
    "excluded_without": "Must be empty when {params} is absent",
    "excluded_without_all": "Must be empty when all of {params} are absent",
    "isdefault": "Must be the zero value",
    "unique": "Values must be unique",
    "omitempty": "",
    "pattern": "Format is invalid",
    "alpha": "Must contain only letters",
    "alphaspace": "Must contain only letters and spaces",
    "alphanum": "Must contain only letters and digits",
    "alphanumspace": "Must contain only letters, digits and spaces",
    "alphanumunicode": "Must contain only letters and digits",
    "alphaunicode": "Must contain only letters",
    "ascii": "Must contain only ASCII characters",
    "printascii": "Must contain only printable ASCII characters",
    "multibyte": "Must contain multibyte characters",
    "number": "Must contain only digits",
    "numeric": "Must be numeric",
    "lowercase": "Must be lowercase",
    "uppercase": "Must be uppercase",
    "contains": "Must contain {p1}",
    "containsany": "Must contain at least one of the characters {p1}",
    "containsrune": "Must contain the character {p1}",
    "excludes": "Must not contain {p1}",
    "excludesall": "Must not contain any of the characters {p1}",
    "excludesrune": "Must not contain the character {p1}",
    "startswith": "Must start with {p1}",
    "startsnotwith": "Must not start with {p1}",
    "endswith": "Must end with {p1}",
    "endsnotwith": "Must not end with {p1}",
    "port": "Must be a valid port number (1-65535)",
    "domain": "Must be a valid domain name",
}
_EN.update({c: f"Must be a valid {n}" for c, n in _FORMAT_NAMES_EN.items()})

# zh-CN format-family nouns — same keys as _FORMAT_NAMES_EN so both
# catalogs cover the identical code set (parity pinned in tests).
_FORMAT_NAMES_ZH = {
    "email": "电子邮件地址", "base64": "base64 字符串",
    "base64url": "base64url 字符串", "base64rawurl": "原始 base64url 字符串",
    "bic": "BIC 代码", "bic_iso_9362_2014": "BIC 代码 (ISO 9362:2014)",
    "bcp47_language_tag": "BCP 47 语言标签",
    "btc_addr": "比特币地址", "btc_addr_bech32": "Bech32 比特币地址",
    "credit_card": "信用卡号", "mongodb": "MongoDB ObjectID",
    "mongodb_connection_string": "MongoDB 连接字符串",
    "cron": "cron 表达式", "spicedb": "SpiceDB 标识符",
    "datetime": "日期时间", "e164": "E.164 电话号码", "ein": "EIN 编号",
    "eth_addr": "以太坊地址", "hexadecimal": "十六进制字符串",
    "hexcolor": "十六进制颜色", "hsl": "HSL 颜色", "hsla": "HSLA 颜色",
    "html": "HTML 片段", "html_encoded": "HTML 编码字符串",
    "isbn": "ISBN", "isbn10": "ISBN-10", "isbn13": "ISBN-13", "issn": "ISSN",
    "iso3166_1_alpha2": "ISO 3166-1 两位国家代码",
    "iso3166_1_alpha3": "ISO 3166-1 三位国家代码",
    "iso3166_1_alpha_numeric": "ISO 3166-1 数字国家代码",
    "iso3166_2": "ISO 3166-2 代码", "iso4217": "ISO 4217 货币代码",
    "json": "JSON 文档", "jwt": "JWT", "latitude": "纬度",
    "longitude": "经度", "luhn_checksum": "Luhn 校验和",
    "postcode_iso3166_alpha2": "邮政编码",
    "postcode_iso3166_alpha2_field": "邮政编码",
    "rgb": "RGB 颜色", "rgba": "RGBA 颜色", "ssn": "社会保障号",
    "timezone": "IANA 时区", "uuid": "UUID", "uuid3": "UUIDv3",
    "uuid4": "UUIDv4", "uuid5": "UUIDv5", "uuid_rfc4122": "RFC 4122 UUID",
    "uuid3_rfc4122": "RFC 4122 UUIDv3", "uuid4_rfc4122": "RFC 4122 UUIDv4",
    "uuid5_rfc4122": "RFC 4122 UUIDv5",
    "md4": "MD4 哈希", "md5": "MD5 哈希", "sha256": "SHA-256 哈希",
    "sha384": "SHA-384 哈希", "sha512": "SHA-512 哈希",
    "ripemd128": "RIPEMD-128 哈希", "ripemd160": "RIPEMD-160 哈希",
    "tiger128": "TIGER-128 哈希", "tiger160": "TIGER-160 哈希",
    "tiger192": "TIGER-192 哈希", "semver": "语义化版本号",
    "ulid": "ULID", "cve": "CVE 编号",
    "cidr": "CIDR 表示法", "cidrv4": "IPv4 CIDR 表示法",
    "cidrv6": "IPv6 CIDR 表示法", "datauri": "data URI",
    "fqdn": "完全限定域名", "hostname": "主机名",
    "hostname_rfc1123": "RFC 1123 主机名", "hostname_port": "主机:端口",
    "ip": "IP 地址", "ip_addr": "IP 地址", "ipv4": "IPv4 地址",
    "ip4_addr": "IPv4 地址", "ipv6": "IPv6 地址",
    "ip6_addr": "IPv6 地址", "mac": "MAC 地址",
    "tcp_addr": "TCP 地址", "tcp4_addr": "TCPv4 地址",
    "tcp6_addr": "TCPv6 地址", "udp_addr": "UDP 地址",
    "udp4_addr": "UDPv4 地址", "udp6_addr": "UDPv6 地址",
    "unix_addr": "Unix 套接字地址", "uds_exists": "已存在的 Unix 套接字",
    "uri": "URI", "url": "URL", "http_url": "HTTP URL",
    "https_url": "HTTPS URL", "url_encoded": "URL 编码字符串",
    "urn_rfc2141": "RFC 2141 URN", "boolean": "布尔字符串",
    "image": "图片文件路径", "dirpath": "目录路径",
    "filepath": "文件路径", "dir": "已存在的目录",
    "file": "已存在的文件",
}

_ZH: dict[str, str] = {
    "required": "该字段为必填项",
    "min": "最小值为 {p1}",
    "max": "最大值为 {p1}",
    "len": "长度必须为 {p1}",
    "oneof": "必须是以下值之一: {params}",
    "eq": "必须等于 {p1}",
    "eq_ignore_case": "必须等于 {p1}（忽略大小写）",
    "ne": "不能等于 {p1}",
    "ne_ignore_case": "不能等于 {p1}（忽略大小写）",
    "gt": "必须大于 {p1}",
    "gte": "必须大于或等于 {p1}",
    "lt": "必须小于 {p1}",
    "lte": "必须小于或等于 {p1}",
    "eqfield": "必须与 {p1} 相等",
    "nefield": "不能与 {p1} 相等",
    "gtfield": "必须大于 {p1}",
    "ltfield": "必须小于 {p1}",
    "gtefield": "必须大于或等于 {p1}",
    "ltefield": "必须小于或等于 {p1}",
    "fieldcontains": "必须包含 {p1} 的值",
    "fieldexcludes": "不能包含 {p1} 的值",
    "required_if": "当 {p1} 为 {p2} 时必填",
    "required_unless": "除非 {p1} 为 {p2}，否则必填",
    "required_with": "当 {params} 存在时必填",
    "required_with_all": "当 {params} 全部存在时必填",
    "required_without": "当 {params} 不存在时必填",
    "required_without_all": "当 {params} 全部不存在时必填",
    "excluded_if": "当 {p1} 为 {p2} 时必须为空",
    "excluded_unless": "除非 {p1} 为 {p2}，否则必须为空",
    "excluded_with": "当 {params} 存在时必须为空",
    "excluded_with_all": "当 {params} 全部存在时必须为空",
    "excluded_without": "当 {params} 不存在时必须为空",
    "excluded_without_all": "当 {params} 全部不存在时必须为空",
    "isdefault": "必须为零值",
    "unique": "值必须唯一",
    "omitempty": "",
    "pattern": "格式无效",
    "alpha": "只能包含字母",
    "alphaspace": "只能包含字母和空格",
    "alphanum": "只能包含字母和数字",
    "alphanumspace": "只能包含字母、数字和空格",
    "alphanumunicode": "只能包含字母和数字",
    "alphaunicode": "只能包含字母",
    "ascii": "只能包含 ASCII 字符",
    "printascii": "只能包含可打印的 ASCII 字符",
    "multibyte": "必须包含多字节字符",
    "number": "只能包含数字",
    "numeric": "必须为数字",
    "lowercase": "必须为小写",
    "uppercase": "必须为大写",
    "contains": "必须包含 {p1}",
    "containsany": "必须包含字符 {p1} 中的至少一个",
    "containsrune": "必须包含字符 {p1}",
    "excludes": "不能包含 {p1}",
    "excludesall": "不能包含字符 {p1} 中的任何一个",
    "excludesrune": "不能包含字符 {p1}",
    "startswith": "必须以 {p1} 开头",
    "startsnotwith": "不能以 {p1} 开头",
    "endswith": "必须以 {p1} 结尾",
    "endsnotwith": "不能以 {p1} 结尾",
    "port": "必须是有效的端口号 (1-65535)",
    "domain": "必须是有效的域名",
}
_ZH.update({c: f"必须是有效的{n}" for c, n in _FORMAT_NAMES_ZH.items()})

CATALOGS: dict[str, dict[str, str]] = {"en": _EN, "zh-CN": _ZH}

_FALLBACK = "{code} check failed"


def translate(code: str, path: str = "", params: str = "", lang: str = "en") -> str:
    """Driver-side single-message rendering (TranslateError analog).

    Positional params (comma-joined, as stored in the violations table)
    map to {p1}, {p2}; {params} is the raw list; {path} the field path.
    Unknown codes fall back to '<code> check failed' (the reference falls
    back to err.Error(), translator.go:86-93); unknown langs fall back to
    the default-language catalog like go-i18n does.
    """
    cat = CATALOGS.get(lang) or _EN
    tpl = cat.get(code) or _EN.get(code) or _FALLBACK.format(code=code)
    parts = params.split(",") if params else []
    return (
        tpl.replace("{path}", path)
        .replace("{params}", params)
        .replace("{p1}", parts[0] if parts else "")
        .replace("{p2}", parts[1] if len(parts) > 1 else "")
    )


def message_column(
    lang: str = "en",
    field: Column | None = None,
    code: Column | None = None,
    params: Column | None = None,
) -> Column:
    """Rendered ``message`` column for a violations DataFrame — pure
    expression (map-literal lookup + string replace), zero Python in the
    executor path."""
    field = F.col("field") if field is None else field
    code = F.col("code") if code is None else code
    params = F.col("params") if params is None else params

    cat = CATALOGS.get(lang) or _EN
    entries: list[Column] = []
    for c, tpl in cat.items():
        entries.append(F.lit(c))
        entries.append(F.lit(tpl))
    catalog = F.create_map(*entries)

    p = F.coalesce(params, F.lit(""))
    parts = F.split(p, ",")
    tpl = F.coalesce(
        F.element_at(catalog, code), F.concat(code, F.lit(" check failed"))
    )
    out = F.replace(tpl, F.lit("{path}"), F.coalesce(field, F.lit("")))
    out = F.replace(out, F.lit("{params}"), p)
    out = F.replace(out, F.lit("{p1}"), F.coalesce(F.get(parts, 0), F.lit("")))
    out = F.replace(out, F.lit("{p2}"), F.coalesce(F.get(parts, 1), F.lit("")))
    return out
