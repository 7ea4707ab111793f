"""Tests for the spec validator (parity with utilities.js:11-127 semantics)."""

import pytest

from fusion_sim_tpu.config import Optional, SpecError, validate_object


def test_required_present():
    validate_object({"a": 1.0, "b": "x"}, {"a": "number", "b": "string"})


def test_required_missing_path_in_error():
    with pytest.raises(SpecError, match="b: required"):
        validate_object({"a": 1.0}, {"a": "number", "b": "string"})


def test_optional_absent_ok():
    validate_object({"a": 1.0}, {"a": "number", "b": Optional("string")})


def test_optional_present_validated():
    with pytest.raises(SpecError, match="b: expected string"):
        validate_object({"a": 1.0, "b": 2}, {"a": "number", "b": Optional("string")})


def test_union_types():
    schema = {"v": ["number", "string"]}
    validate_object({"v": 3}, schema)
    validate_object({"v": "three"}, schema)
    with pytest.raises(SpecError, match="no union alternative"):
        validate_object({"v": [1]}, schema)


def test_nested_object_path():
    schema = {"outer": {"inner": "number"}}
    validate_object({"outer": {"inner": 5}}, schema)
    with pytest.raises(SpecError, match="outer.inner"):
        validate_object({"outer": {"inner": "bad"}}, schema)


def test_boolean_not_number():
    with pytest.raises(SpecError):
        validate_object({"a": True}, {"a": "number"})


def test_function_type():
    validate_object({"f": lambda: None}, {"f": "function"})
    with pytest.raises(SpecError):
        validate_object({"f": 1}, {"f": "function"})


def test_array_type():
    validate_object({"a": [1, 2]}, {"a": "array"})
    with pytest.raises(SpecError):
        validate_object({"a": 1}, {"a": "array"})
