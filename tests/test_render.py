"""Render subsystem tests: rasterizer content, AVI structure, recorder."""

import struct

import numpy as np
import pytest

from particlerobotsimulations_tpu import SimParams, Simulation
from particlerobotsimulations_tpu.render.avi import AviWriter
from particlerobotsimulations_tpu.render.raster import (
    BACKGROUND,
    GROUND,
    LIGHT,
    OBSTACLE,
    render_frame,
)
from particlerobotsimulations_tpu.render import native
from particlerobotsimulations_tpu.render.video import VideoRecorder


def test_frame_contains_scene_elements():
    p = SimParams(
        n_cells=1, n_dead=0, camera_x=0.0, camera_y=5.0,
        light_x=-2.0, light_y=0.0,
        circle_obstacles=((1.0, 0.0, 0.5),),
    )
    pos = np.array([[0.0, 0.0]], np.float32)
    rad = np.array([0.3], np.float32)  # big so it covers pixels
    colors = np.array([[0.1, 0.8, 0.2, 1.0]], np.float32)
    frame = render_frame(p, pos, rad, colors, width=320, height=180)
    assert frame.shape == (180, 320, 3)
    flat = frame.reshape(-1, 3)
    # ground fills most pixels; light, obstacle and the bot all painted
    assert (flat == GROUND).all(axis=1).mean() > 0.5
    assert (flat == LIGHT).all(axis=1).any()
    assert (flat == OBSTACLE).all(axis=1).any()
    bot_col = (np.clip(colors[0, :3], 0, 1) * 255).astype(np.uint8)
    assert (flat == bot_col).all(axis=1).any()


def test_native_matches_numpy_rasterizer():
    if not native.available():
        pytest.skip("native splatting library not built")
    from particlerobotsimulations_tpu.render.raster import _splat_disks_numpy

    rng = np.random.default_rng(0)
    img_a = np.zeros((64, 96, 3), np.uint8)
    img_b = np.zeros((64, 96, 3), np.uint8)
    xs = rng.uniform(0, 96, 20).astype(np.float32)
    ys = rng.uniform(0, 64, 20).astype(np.float32)
    rs = rng.uniform(1, 6, 20).astype(np.float32)
    cols = rng.integers(0, 255, (20, 3)).astype(np.uint8)
    native.splat_disks(img_a, xs, ys, rs, cols)
    _splat_disks_numpy(img_b, xs, ys, rs, cols)
    # identical disk membership test -> identical images
    np.testing.assert_array_equal(img_a, img_b)


def test_avi_roundtrip(tmp_path):
    path = str(tmp_path / "t.avi")
    frames = [
        (np.full((32, 64, 3), v, np.uint8)) for v in (10, 128, 250)
    ]
    with AviWriter(path, 64, 32, fps=20, codec="DIB ") as w:
        for f in frames:
            w.write_frame(f)
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    # total frames patched in avih
    assert struct.unpack("<I", data[48:52])[0] == 3
    # decode first movi frame and compare (DIB: bottom-up BGR)
    movi = data.find(b"movi")
    first = data.find(b"00db", movi)
    size = struct.unpack("<I", data[first + 4 : first + 8])[0]
    raw = np.frombuffer(data[first + 8 : first + 8 + size], np.uint8)
    decoded = raw.reshape(32, 64, 3)[::-1, :, ::-1]
    np.testing.assert_array_equal(decoded, frames[0])


def test_render3d_scene_elements():
    from particlerobotsimulations_tpu.render.raster3d import render_frame_3d

    p = SimParams(
        n_cells=1, n_dead=0, camera_x=0.0, camera_y=12.0,
        light_x=-2.0, light_y=0.0,
        circle_obstacles=((1.0, 0.0, 0.5),),
        rect_obstacles=((2.0, 2.4, -1.0, 1.0),),
    )
    pos = np.array([[0.0, 0.0]], np.float32)
    rad = np.array([0.3], np.float32)
    colors = np.array([[0.1, 0.8, 0.2, 1.0]], np.float32)
    frame = render_frame_3d(p, pos, rad, colors, width=320, height=180)
    flat = frame.reshape(-1, 3)
    assert (flat == GROUND).all(axis=1).mean() > 0.5   # ground fills the view
    assert (flat == LIGHT).all(axis=1).any()
    assert (flat == OBSTACLE).all(axis=1).any()
    bot_col = (np.clip(colors[0, :3], 0, 1) * 255).astype(np.uint8)
    assert (flat == bot_col).all(axis=1).any()


def test_render3d_perspective_sizing():
    # same bot radius, farther from an oblique camera -> fewer pixels
    from particlerobotsimulations_tpu.render.raster3d import render_frame_3d

    p = SimParams(n_cells=1, n_dead=0, camera_x=8.0, camera_y=3.0)
    colors = np.array([[1.0, 0.0, 1.0, 1.0]], np.float32)  # unique magenta
    rad = np.array([0.3], np.float32)

    def bot_pixels(x):
        f = render_frame_3d(
            p, np.array([[x, 0.0]], np.float32), rad, colors,
            width=320, height=180,
        )
        return (f.reshape(-1, 3) == (255, 0, 255)).all(axis=1).sum()

    near = bot_pixels(-4.0)   # scene x=+4, toward the camera at +8
    far = bot_pixels(4.0)
    assert near > far > 0


def test_video_recorder_3d_style(tmp_path):
    p = SimParams(n_cells=12, n_dead=0, seed=2, max_time=5.0)
    sim = Simulation(p)
    path = str(tmp_path / "v3.avi")
    with VideoRecorder(p, path=path, width=160, height=120, style="3d") as rec:
        rec.capture(sim)
    data = open(path, "rb").read()
    assert struct.unpack("<I", data[48:52])[0] == 1


def test_jpeg_encode_roundtrip():
    # native encoder output must decode (PIL) back to ~the input frame
    p = SimParams(
        n_cells=1, n_dead=0, camera_x=0.0, camera_y=5.0,
        light_x=-2.0, light_y=0.0,
    )
    pos = np.array([[0.0, 0.0]], np.float32)
    rad = np.array([0.3], np.float32)
    colors = np.array([[0.1, 0.8, 0.2, 1.0]], np.float32)
    frame = render_frame(p, pos, rad, colors, width=320, height=184)
    data = native.encode_jpeg(frame, quality=90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert len(data) < frame.nbytes / 4  # actually compressed
    import io

    from PIL import Image

    dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert dec.shape == frame.shape
    err = np.abs(dec.astype(np.int32) - frame.astype(np.int32))
    assert err.mean() < 3.0  # flat scene: tiny mean quantization error


def test_mjpeg_avi_roundtrip(tmp_path):
    path = str(tmp_path / "m.avi")
    rng = np.random.default_rng(3)
    frames = []
    for v in (40, 120, 220):
        f = np.full((32, 64, 3), v, np.uint8)
        f[8:16, 8:24] = rng.integers(0, 255, (8, 16, 3), dtype=np.uint8)
        frames.append(f)
    with AviWriter(path, 64, 32, fps=20) as w:  # MJPG default
        for f in frames:
            w.write_frame(f)
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    assert struct.unpack("<I", data[48:52])[0] == 3  # avih dwTotalFrames
    assert b"MJPG" in data[:200]  # strh fccHandler + strf biCompression
    # walk idx1: offsets measured from the 'movi' list fourcc (first = 4)
    movi_fourcc = data.find(b"movi")
    idx1 = data.find(b"idx1")
    import io

    from PIL import Image

    n_entries = struct.unpack("<I", data[idx1 + 4 : idx1 + 8])[0] // 16
    assert n_entries == 3
    for i, f in enumerate(frames):
        ckid, flags, off, size = struct.unpack(
            "<4sIII", data[idx1 + 8 + 16 * i : idx1 + 24 + 16 * i]
        )
        assert ckid == b"00dc" and flags == 0x10
        chunk_pos = movi_fourcc + off
        assert data[chunk_pos : chunk_pos + 4] == b"00dc"
        jpeg = data[chunk_pos + 8 : chunk_pos + 8 + size]
        dec = np.asarray(Image.open(io.BytesIO(jpeg)).convert("RGB"))
        err = np.abs(dec.astype(np.int32) - f.astype(np.int32))
        assert err.mean() < 6.0  # noise block costs a bit of JPEG error


def test_avi_rejects_bad_frame(tmp_path):
    w = AviWriter(str(tmp_path / "t.avi"), 64, 32)
    with pytest.raises(ValueError):
        w.write_frame(np.zeros((32, 60, 3), np.uint8))
    w.close()


def test_video_recorder(tmp_path):
    p = SimParams(n_cells=12, n_dead=0, seed=2, max_time=5.0)
    sim = Simulation(p)
    path = str(tmp_path / "v.avi")
    with VideoRecorder(p, path=path, width=160, height=120) as rec:
        rec.capture(sim)
        sim.step_chunk(100)
        rec.capture(sim)
    data = open(path, "rb").read()
    assert struct.unpack("<I", data[48:52])[0] == 2
