"""Golden-record tests vs compiled reference lancet (skipped when the
binary is absent; see .claude/skills/verify/SKILL.md to build it)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.golden_compare import compare_one  # noqa: E402

BIN = os.environ.get("LANCET_REF_BIN", "/tmp/refbuild/src/lancet")

pytestmark = pytest.mark.skipif(not os.path.exists(BIN),
                                reason="reference lancet binary not built")


@pytest.mark.parametrize("name", ["somatic_snv", "somatic_ins", "somatic_del",
                                  "adjacent_complex", "str_indel",
                                  "paired_overlap", "lr_snv",
                                  "random_storm"])
def test_golden_record_equal(name):
    good, msg = compare_one(name, 0, BIN)
    assert good, msg


@pytest.mark.parametrize("name", ["somatic_del", "paired_overlap"])
def test_golden_record_equal_fast_engine(name):
    good, msg = compare_one(name, 0, BIN, engine="tpu")
    assert good, msg
