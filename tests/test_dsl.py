"""DSL parser/validator/registry tests — the refusal-path coverage model
(reference tests/refusal_path_coverage.rs: every E_* code reachable)."""

import pytest

from fingerprint_spark.dsl.model import make_assertion, FingerprintDefinition
from fingerprint_spark.dsl.parser import ParseError, parse_yaml
from fingerprint_spark.dsl.registry import Registry, RegistryError, builtin_rules
from fingerprint_spark.dsl.validate import ValidationError, validate_definition


GOOD = """
fingerprint_id: demo.v1
format: html
assertions:
  - heading_regex:
      pattern: "Report"
  - name: named_one
    text_contains:
      value: "hello"
  - heading_regex:
      pattern: "Other"
"""


def test_parse_and_autonaming():
    d = parse_yaml(GOOD)
    names = [a.name for a in d.assertions]
    # deterministic auto-naming with dedup counters (parser.rs:53-72)
    assert names == ["heading_regex", "named_one", "heading_regex_2"]
    assert d.source_hash.startswith("md5:")
    assert d.version == "v1"


def test_parse_determinism():
    assert parse_yaml(GOOD).source_hash == parse_yaml(GOOD).source_hash


def test_unknown_assertion_is_hard_error():
    with pytest.raises(ParseError) as e:
        parse_yaml(GOOD.replace("heading_regex", "not_an_assertion"))
    assert e.value.code == "E_UNKNOWN_ASSERTION"


def test_missing_field():
    with pytest.raises(ParseError) as e:
        parse_yaml("format: html\nassertions: []\n")
    assert e.value.code == "E_MISSING_FIELD"


def test_invalid_yaml():
    with pytest.raises(ParseError) as e:
        parse_yaml(": not valid : yaml : [")
    assert e.value.code == "E_INVALID_YAML"


def test_validate_format_whitelist():
    d = parse_yaml(GOOD.replace("format: html", "format: docx"))
    with pytest.raises(ValidationError) as e:
        validate_definition(d)
    assert e.value.code == "E_INVALID_YAML"


def test_validate_html_only_gating():
    bad = """
fingerprint_id: x.v1
format: markdown
assertions:
  - dominant_column_count:
      expected: 3
"""
    with pytest.raises(ValidationError):
        validate_definition(parse_yaml(bad))


def test_validate_missing_params():
    bad = """
fingerprint_id: x.v1
format: html
assertions:
  - heading_level:
      pattern: "x"
"""
    with pytest.raises(ValidationError) as e:
        validate_definition(parse_yaml(bad))
    assert e.value.code == "E_MISSING_FIELD"


def test_validate_content_hash_refs():
    bad = """
fingerprint_id: x.v1
format: html
assertions:
  - text_regex: {pattern: "x"}
extract:
  - name: s1
    section: {heading_pattern: "A"}
content_hash:
  over: [nonexistent]
"""
    with pytest.raises(ValidationError):
        validate_definition(parse_yaml(bad))


def test_registry_duplicate_refusal():
    reg = Registry(builtin_rules())
    with pytest.raises(RegistryError) as e:
        reg.register(reg.get("spam_pharma.v1"))
    assert e.value.code == "E_DUPLICATE_FP_ID"


def test_registry_unknown_fp():
    with pytest.raises(RegistryError) as e:
        Registry(builtin_rules()).get("nope.v9")
    assert e.value.code == "E_UNKNOWN_FP"


def test_registry_orphan_child():
    reg = Registry(builtin_rules())
    with pytest.raises(RegistryError) as e:
        reg.resolve(["spam_cta.v1"])  # child without its parent
    assert e.value.code == "E_ORPHAN_CHILD"
    # with the parent present it resolves in order
    defs = reg.resolve(["spam_pharma.v1", "spam_cta.v1"])
    assert [d.fingerprint_id for d in defs] == ["spam_pharma.v1", "spam_cta.v1"]


def test_registry_trust_allowlist(tmp_path):
    f = tmp_path / "custom.fp.yaml"
    f.write_text(GOOD)
    with pytest.raises(RegistryError) as e:
        Registry.load_dir(tmp_path, trusted_globs=["other*.fp.yaml"])
    assert e.value.code == "E_UNTRUSTED_FP"
    reg = Registry.load_dir(tmp_path, trusted_globs=["custom*.fp.yaml"])
    assert reg.get("demo.v1").source.endswith("custom.fp.yaml")


def test_registry_deterministic_listing():
    reg = Registry(builtin_rules())
    ids = [d.fingerprint_id for d in reg.list()]
    assert ids == sorted(ids)
