"""Tests for tools/chunk_videos.py: the datasets/README.md:19-21 prep
step (15-sec chunks, short-side resize) producing the layout
``load_clip`` consumes."""

import os
import os.path as osp

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from avion_tpu.data.sampling import load_clip
from avion_tpu.tools.chunk_videos import (
    chunk_dataset,
    chunk_video,
    scaled_size,
)

FPS = 10.0


def write_source_video(path, n_frames=120, w=96, h=64):
    """Frames whose mean blue level encodes the frame index."""
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), FPS, (w, h))
    for i in range(n_frames):
        frame = np.full((h, w, 3), 0, np.uint8)
        frame[:, :, 0] = min(2 * i, 255)  # BGR: blue ramps with index
        vw.write(frame)
    vw.release()


def test_scaled_size():
    assert scaled_size(640, 480, 288) == (384, 288)
    assert scaled_size(480, 640, 288) == (288, 384)
    assert scaled_size(200, 100, 288) == (200, 100)  # already smaller
    assert scaled_size(640, 480, 0) == (640, 480)    # disabled
    # odd results round down to even
    w, h = scaled_size(501, 1000, 288)
    assert w % 2 == 0 and h % 2 == 0 and w == 288


def test_chunk_video_layout_and_content(tmp_path):
    src = str(tmp_path / "vid1.mp4")
    write_source_video(src, n_frames=120)  # 12 s at 10 fps
    out_dir = str(tmp_path / "chunked")
    outs = chunk_video(src, out_dir, chunk_len=5, short_side=32,
                       backend="cv2")
    names = sorted(osp.basename(p) for p in outs)
    assert names == ["0.mp4", "10.mp4", "5.mp4"]
    assert all(osp.dirname(p) == osp.join(out_dir, "vid1.mp4")
               for p in outs)
    # chunk 1 holds frames 50-99, resized to short side 32 (48x32)
    cap = cv2.VideoCapture(osp.join(out_dir, "vid1.mp4", "5.mp4"))
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    ok, frame = cap.read()
    cap.release()
    assert (n, w, h) == (50, 48, 32)
    assert ok
    # first frame of the second chunk is source frame 50: blue ~100
    assert abs(int(frame[:, :, 0].mean()) - 100) <= 12


def test_chunked_output_feeds_load_clip(tmp_path):
    src = str(tmp_path / "raw" / "walkvid.mp4")
    os.makedirs(osp.dirname(src))
    write_source_video(src, n_frames=150)  # 15 s
    out_dir = str(tmp_path / "chunked")
    chunk_video(src, out_dir, chunk_len=5, short_side=0, backend="cv2")
    clip = load_clip(out_dir, "walkvid", "mp4", second=6.0,
                     end_second=9.0, chunk_len=5, fps=FPS, clip_length=4)
    assert clip.shape == (4, 64, 96, 3)
    # frames come from ~6-9 s => source frames ~60-90 => blue 120-180
    means = clip[:, :, :, 2].mean(axis=(1, 2))  # RGB: blue is channel 2
    assert means[0] > 90 and means[-1] > means[0]


def test_chunk_dataset_pool_and_errors(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    write_source_video(str(raw / "a.mp4"), n_frames=30)
    write_source_video(str(raw / "b.mp4"), n_frames=30)
    (raw / "broken.mp4").write_bytes(b"not a video")
    out_dir = str(tmp_path / "out")
    results = chunk_dataset(str(raw), out_dir, chunk_len=2, short_side=0,
                            workers=1, backend="cv2")
    by_name = {osp.basename(v): (n, err) for v, n, err in results}
    assert by_name["a.mp4"][0] == 2 and by_name["a.mp4"][1] is None
    assert by_name["b.mp4"][0] == 2
    # a corrupt file is reported, not fatal
    assert by_name["broken.mp4"][0] == 0


def test_chunk_cli(tmp_path, capsys):
    from avion_tpu.tools.chunk_videos import main

    raw = tmp_path / "raw"
    raw.mkdir()
    write_source_video(str(raw / "v.mp4"), n_frames=40)
    rc = main(["--input-dir", str(raw), "--output-dir",
               str(tmp_path / "out"), "--chunk-length", "2",
               "--short-side", "0", "--workers", "1", "--backend", "cv2"])
    assert rc == 0
    assert "chunked 1/1 videos into 2 chunks" in capsys.readouterr().out
