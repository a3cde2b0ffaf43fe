import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from avion_tpu.data.video_reader import (
    CropSpec,
    DecodeError,
    VideoReader,
    native_available,
)


@pytest.fixture(scope="module")
def test_video(tmp_path_factory):
    """60-frame video: brightness encodes frame index; left half red-ish,
    right half blue-ish (to verify crops and flips)."""
    path = str(tmp_path_factory.mktemp("vid") / "test.mp4")
    w, h, n = 64, 48, 60
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    assert vw.isOpened()
    for i in range(n):
        frame = np.zeros((h, w, 3), np.uint8)
        v = int(40 + i * 3)
        frame[:, : w // 2] = (0, 0, v)      # BGR: red-ish left
        frame[:, w // 2 :] = (v, 0, 0)      # blue-ish right
        vw.write(frame)
    vw.release()
    return path, w, h, n


def test_native_lib_builds():
    assert native_available(), "native decode library should build in CI"


@pytest.mark.parametrize("backend", ["native", "cv2"])
def test_metadata(test_video, backend):
    path, w, h, n = test_video
    vr = VideoReader(path, backend=backend)
    assert len(vr) == n
    assert abs(vr.get_avg_fps() - 30.0) < 0.5
    assert (vr.width, vr.height) == (w, h)


@pytest.mark.parametrize("backend", ["native", "cv2"])
def test_frame_accuracy(test_video, backend):
    path, w, h, n = test_video
    vr = VideoReader(path, backend=backend)
    ids = [0, 10, 30, 59]
    frames = vr.get_batch(ids, CropSpec(), (w, h))
    assert frames.shape == (4, h, w, 3)
    for k, fid in enumerate(ids):
        expected = 40 + fid * 3
        got = float(frames[k, :, : w // 2, 0].mean())  # red channel, left
        assert abs(got - expected) < 12, (fid, got, expected)


@pytest.mark.parametrize("backend", ["native", "cv2"])
def test_fused_crop_and_flip(test_video, backend):
    path, w, h, n = test_video
    vr = VideoReader(path, backend=backend)
    # crop the left half: should be red-dominant
    left = vr.get_batch([20], CropSpec(0.0, 0.0, 0.5, 1.0), (32, 32))
    assert left[0, :, :, 0].mean() > 3 * left[0, :, :, 2].mean() + 1
    # crop the right half: blue-dominant
    right = vr.get_batch([20], CropSpec(0.5, 0.0, 0.5, 1.0), (32, 32))
    assert right[0, :, :, 2].mean() > 3 * right[0, :, :, 0].mean() + 1
    # full frame + hflip: left side of output is blue-dominant
    flipped = vr.get_batch([20], CropSpec(hflip=True), (w, h))
    lhalf = flipped[0, :, : w // 2]
    assert lhalf[:, :, 2].mean() > lhalf[:, :, 0].mean()


def test_duplicate_and_unsorted_ids(test_video):
    path, w, h, n = test_video
    vr = VideoReader(path, backend="native")
    frames = vr.get_batch([30, 5, 30], CropSpec(), (w, h))
    np.testing.assert_array_equal(frames[0], frames[2])
    assert abs(float(frames[1, :, : w // 2, 0].mean()) - (40 + 5 * 3)) < 12


def test_sequential_batches_reuse_decoder(test_video):
    path, w, h, n = test_video
    vr = VideoReader(path, backend="native")
    a = vr.get_batch([0, 1, 2, 3], CropSpec(), (w, h))
    b = vr.get_batch([4, 5, 6, 7], CropSpec(), (w, h))
    assert a.shape == b.shape == (4, h, w, 3)
    assert float(b[-1, :, : w // 2, 0].mean()) > float(a[0, :, : w // 2, 0].mean())


def test_missing_file_raises():
    with pytest.raises(DecodeError):
        VideoReader("/nonexistent/file.mp4")
