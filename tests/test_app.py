"""App-level units: config/CLI parsing, letterbox blit, debug views,
screenshot saver, profiling stats."""

import time

import numpy as np

from tpu_raytracer.utils.config import parse_args
from tpu_raytracer.utils.profiling import FrameStats


def test_scale_flag_parses_like_reference():
    cfg = parse_args(["--scale=640x360"])
    assert (cfg.width, cfg.height) == (640, 360)
    # invalid format falls back to the 1280x720 default (main.rs:117-121)
    cfg = parse_args(["--scale=banana"])
    assert (cfg.width, cfg.height) == (1280, 720)
    cfg = parse_args(["--scene", "restir", "--denoise", "--target-spp", "64"])
    assert cfg.scene == "restir" and cfg.denoise and cfg.target_spp == 64


def test_letterbox_aspect():
    from tpu_raytracer.app.interactive import letterbox

    img = np.ones((100, 200, 3), np.float32)  # 2:1 into a square window
    out = letterbox(img, 300, 300)
    assert out.shape == (300, 300, 3)
    # bars top and bottom are the blit clear color (blue, blit.rs:119)
    assert (out[0] == np.array([0, 0, 255], np.uint8)).all()
    mid = out[150]
    assert (mid == 255).all()  # full-width content row


def test_screenshot_saver_roundtrip(tmp_path):
    from tpu_raytracer.app.screenshot import ScreenshotSaver

    saver = ScreenshotSaver(out_dir=str(tmp_path))
    img = np.random.rand(16, 16, 3).astype(np.float32)
    assert saver.submit(img, label="t")
    saver.flush()
    files = list(tmp_path.glob("t_*.png"))
    assert len(files) == 1 and saver.saved == 1


def test_frame_stats():
    fs = FrameStats(window=8)
    for _ in range(4):
        fs.frame(1e6)
        time.sleep(0.01)
    assert fs.fps > 0
    assert fs.mrays_per_s > 0
    assert "fps" in fs.summary()
