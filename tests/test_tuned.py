"""TUNED.json measured-winner gate defaults (utils/tuned.py) +
the autoflip decision logic (scripts/r4_autoflip.py)."""

import json
import os
import subprocess
import sys

from tpu_raytracer.utils import tuned

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_apply_tuned_setdefault_semantics(tmp_path, monkeypatch):
    p = tmp_path / "TUNED.json"
    p.write_text(json.dumps({"env": {
        "TPU_RT_KERNEL": "mxuv2", "TPU_RT_OHG": "1",
        "PATH": "/evil",                      # non-gate key: ignored
    }}))
    monkeypatch.delenv("TPU_RT_KERNEL", raising=False)
    monkeypatch.setenv("TPU_RT_OHG", "0")     # explicit env must win
    old_path = os.environ["PATH"]
    applied = tuned.apply_tuned(str(p))
    assert applied == {"TPU_RT_KERNEL": "mxuv2"}
    assert os.environ["TPU_RT_KERNEL"] == "mxuv2"
    assert os.environ["TPU_RT_OHG"] == "0"
    assert os.environ["PATH"] == old_path
    monkeypatch.delenv("TPU_RT_KERNEL")


def test_apply_tuned_disabled_and_missing(tmp_path, monkeypatch):
    p = tmp_path / "TUNED.json"
    p.write_text(json.dumps({"env": {"TPU_RT_KERNEL": "mxuv2"}}))
    monkeypatch.delenv("TPU_RT_KERNEL", raising=False)
    monkeypatch.setenv("TPU_RT_TUNED", "0")
    assert tuned.apply_tuned(str(p)) == {}
    assert "TPU_RT_KERNEL" not in os.environ
    monkeypatch.delenv("TPU_RT_TUNED")
    assert tuned.apply_tuned(str(tmp_path / "absent.json")) == {}
    (tmp_path / "bad.json").write_text("{not json")
    assert tuned.apply_tuned(str(tmp_path / "bad.json")) == {}


def _fake_ladder(tmp_path, values):
    for step, v in values.items():
        line = json.dumps({
            "metric": "cornell_restir_512x512_mrays_per_s_per_chip",
            "value": v, "unit": "Mrays/s"})
        (tmp_path / f"{step}.log").write_text(line + "\n")


def _run_autoflip(tmp_path):
    out = tmp_path / "out" / "TUNED.json"
    os.makedirs(tmp_path / "out", exist_ok=True)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/r4_autoflip.py"),
         "--dir", str(tmp_path), "--no-commit", "--out", str(out)],
        capture_output=True, text=True, cwd=REPO)
    return r, out


def test_autoflip_adopts_measured_winner(tmp_path):
    _fake_ladder(tmp_path, {"00_headline_default": 10.0,
                            "05_headline_combo": 12.5,
                            "08_headline_tapbatch": 9.0})
    # config logs don't carry the headline metric; must be ignored
    (tmp_path / "15_config1.log").write_text('{"config": 1}\n')
    r, out_p = _run_autoflip(tmp_path)
    assert r.returncode == 0, r.stderr
    out = json.load(open(out_p))
    assert out["from_step"] == "05_headline_combo"
    # the adopted env set is parsed from r3_measure.sh itself
    assert out["env"] == {"TPU_RT_KERNEL": "mxuv2", "TPU_RT_OHG": "1"}
    assert out["value"] == 12.5 and out["baseline"] == 10.0


def test_autoflip_keeps_defaults_within_margin(tmp_path):
    _fake_ladder(tmp_path, {"00_headline_default": 10.0,
                            "04_headline_ohg": 10.1})
    r, out_p = _run_autoflip(tmp_path)
    assert r.returncode == 0, r.stderr
    out = json.load(open(out_p))
    assert out["env"] == {}
    assert out["from_step"] == "00_headline_default"


def test_autoflip_requires_baseline_step(tmp_path):
    _fake_ladder(tmp_path, {"04_headline_ohg": 11.0})
    r, out_p = _run_autoflip(tmp_path)
    assert r.returncode == 1
    assert not os.path.exists(out_p)


def test_autoflip_never_adopts_parity_unsafe_gates(tmp_path):
    # tap_batch diverges from the reference RNG stream under blocked
    # taps; even a huge measured win must not be adopted unattended
    _fake_ladder(tmp_path, {"00_headline_default": 10.0,
                            "08_headline_tapbatch": 99.0})
    r, out_p = _run_autoflip(tmp_path)
    assert r.returncode == 0, r.stderr
    out = json.load(open(out_p))
    assert out["from_step"] == "00_headline_default"
    assert out["env"] == {}
