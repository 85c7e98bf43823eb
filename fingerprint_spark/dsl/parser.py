"""YAML rule parser with deterministic auto-naming.

Reference: src/dsl/parser.rs:44-189. Unknown assertion keys are a hard
parse error (E_UNKNOWN_ASSERTION, parser tests :602-616); anonymous
assertions get deterministic auto-names with dedup counters
(parser.rs:53-72).

YAML shape (same as the reference's .fp.yaml):

    fingerprint_id: spam_pharma.v1
    format: html
    valid_from: "2024-01-01"        # optional
    parent: root_rule.v1            # optional
    assertions:
      - heading_regex:
          pattern: "Cheap (Pills|Meds)"
      - name: has_cta                # explicit name
        text_contains:
          value: "click here"
    extract:
      - name: offer_section
        section:
          heading_pattern: "Special Offer"
    content_hash:
      algo: md5
      over: [offer_section]
"""

from __future__ import annotations

import hashlib

import yaml

from .model import (
    ASSERTION_TYPES,
    Assertion,
    ContentHashConfig,
    ExtractSection,
    FingerprintDefinition,
    make_assertion,
)

EXTRACT_TYPES = frozenset(["range", "section", "table", "text_match"])


class ParseError(ValueError):
    def __init__(self, code: str, message: str):
        super().__init__(f"{code}: {message}")
        self.code = code


def _auto_name(type_: str, counters: dict[str, int]) -> str:
    """Deterministic auto-naming with dedup counters (parser.rs:53-72)."""
    n = counters.get(type_, 0)
    counters[type_] = n + 1
    return type_ if n == 0 else f"{type_}_{n + 1}"


def _parse_assertion(entry: dict, counters: dict[str, int]) -> Assertion:
    if not isinstance(entry, dict):
        raise ParseError("E_INVALID_YAML", f"assertion entry must be a map: {entry!r}")
    entry = dict(entry)
    explicit_name = entry.pop("name", None)
    if len(entry) != 1:
        raise ParseError(
            "E_UNKNOWN_ASSERTION",
            f"assertion entry must have exactly one type key, got {sorted(entry)}",
        )
    (type_, params), = entry.items()
    if type_ not in ASSERTION_TYPES:
        raise ParseError("E_UNKNOWN_ASSERTION", f"unknown assertion type {type_!r}")
    if params is None:
        params = {}
    if not isinstance(params, dict):
        raise ParseError("E_INVALID_YAML", f"{type_} params must be a map")
    name = explicit_name or _auto_name(type_, counters)
    return make_assertion(type_, name, params)


def _parse_extract(entry: dict, counters: dict[str, int]) -> ExtractSection:
    if not isinstance(entry, dict):
        raise ParseError("E_INVALID_YAML", f"extract entry must be a map: {entry!r}")
    entry = dict(entry)
    explicit_name = entry.pop("name", None)
    if len(entry) != 1:
        raise ParseError(
            "E_INVALID_YAML", "extract entry must have exactly one type key"
        )
    (type_, params), = entry.items()
    if type_ not in EXTRACT_TYPES:
        raise ParseError("E_INVALID_YAML", f"unknown extract type {type_!r}")
    name = explicit_name or _auto_name(f"extract_{type_}", counters)
    return ExtractSection(
        name=name, type=type_,
        params=tuple(sorted((params or {}).items(), key=lambda kv: kv[0])),
    )


def parse_definition(data: dict, source: str = "inline") -> FingerprintDefinition:
    for required in ("fingerprint_id", "format", "assertions"):
        if required not in data:
            raise ParseError("E_MISSING_FIELD", f"missing required field {required!r}")
    counters: dict[str, int] = {}
    assertions = tuple(
        _parse_assertion(e, counters) for e in data["assertions"] or []
    )
    ex_counters: dict[str, int] = {}
    extract = tuple(_parse_extract(e, ex_counters) for e in data.get("extract") or [])
    ch = None
    if data.get("content_hash") is not None:
        chd = data["content_hash"]
        ch = ContentHashConfig(
            algo=chd.get("algo", "md5"), over=tuple(chd.get("over") or ())
        )
    canonical = yaml.safe_dump(data, sort_keys=True).encode()
    return FingerprintDefinition(
        fingerprint_id=str(data["fingerprint_id"]),
        format=str(data["format"]),
        valid_from=data.get("valid_from"),
        valid_until=data.get("valid_until"),
        parent=data.get("parent"),
        assertions=assertions,
        extract=extract,
        content_hash=ch,
        source=source,
        # provenance: hash of the canonicalized YAML
        # (reference compile/codegen.rs embeds blake3 source_hash)
        source_hash="md5:" + hashlib.md5(canonical).hexdigest(),
    )


def parse_yaml(text: str, source: str = "inline") -> FingerprintDefinition:
    try:
        data = yaml.safe_load(text)
    except yaml.YAMLError as e:
        raise ParseError("E_INVALID_YAML", str(e)) from e
    if not isinstance(data, dict):
        raise ParseError("E_INVALID_YAML", "definition must be a YAML mapping")
    return parse_definition(data, source=source)
