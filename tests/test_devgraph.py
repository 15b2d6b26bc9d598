"""Integrated device graph engine (runner -> shardrun.run_shards_device
-> tpu pipeline -> native scan finish) must be VCF-identical to the
fully-native shard runner on golden scenarios, including k-retry and
fallback-window paths."""

import os

import pytest

from lancet_tpu.config import Config
from lancet_tpu.runner import run
from tests.goldengen import scenario
from tests.helpers import write_pair


def _native_available() -> bool:
    try:
        from lancet_tpu.native import load_library

        load_library()
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _native_available(), reason="no native toolchain")
@pytest.mark.parametrize("name", [
    "somatic_snv", "somatic_del", "str_indel", "paired_overlap",
    "adjacent_complex",
])
def test_devgraph_matches_native(tmp_path, name, monkeypatch):
    refseq, tumor, normal, region = scenario(name, 1)
    ref_path, t_path, n_path = write_pair(str(tmp_path), refseq, "chr1",
                                          tumor, normal)
    cfg = Config(tumor_bam=t_path, normal_bam=n_path, ref_fasta=ref_path,
                 region=region)
    monkeypatch.setenv("LANCET_TPU_DEVGRAPH", "1")
    stats: dict = {}
    v_dev = run(cfg, command_line="x", date="D\n", engine="tpu",
                stats=stats)
    monkeypatch.setenv("LANCET_TPU_DEVGRAPH", "0")
    v_nat = run(cfg, command_line="x", date="D\n", engine="tpu")
    assert v_dev == v_nat
    if name == "paired_overlap":
        # mate-overlap candidates must route through the native replay
        assert stats.get("n_dev_fallback", 0) > 0
