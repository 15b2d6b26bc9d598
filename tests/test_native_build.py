"""The native fast paths must be interchangeable with the numpy fast path:
(a) the full C++ per-k pipeline (fastpipe.run_k_native), (b) the C++ build
kernel + Python stages (fastbuild.build_graph_native), and (c) pure numpy —
identical VCFs end-to-end on every scenario family (all already proven
equal to the oracle engine by test_engine_equiv and the golden corpus)."""

import pytest

import lancet_tpu.engine.fastbuild as fb
import lancet_tpu.engine.fastpipe as fp
from lancet_tpu.config import Config
from lancet_tpu.runner import run
from tests.goldengen import ALL_SCENARIOS, scenario
from tests.helpers import write_pair


def _native_available() -> bool:
    try:
        from lancet_tpu.native import load_library

        load_library()
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _native_available(), reason="no native toolchain")
@pytest.mark.parametrize("name", ALL_SCENARIOS)
def test_native_modes_match(tmp_path, monkeypatch, name):
    refseq, tumor, normal, region = scenario(name, 3)
    ref_path, t_path, n_path = write_pair(str(tmp_path), refseq, "chr1",
                                          tumor, normal)
    cfg = Config(tumor_bam=t_path, normal_bam=n_path, ref_fasta=ref_path,
                 region=region)
    v_pipeline = run(cfg, command_line="x", date="D\n", engine="tpu")

    monkeypatch.setattr(fp, "available", lambda: False)
    v_buildonly = run(cfg, command_line="x", date="D\n", engine="tpu")

    monkeypatch.setattr(fb, "build_graph_native", lambda g, r: False)
    v_numpy = run(cfg, command_line="x", date="D\n", engine="tpu")

    assert v_pipeline == v_buildonly
    assert v_buildonly == v_numpy
