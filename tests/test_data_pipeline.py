import os
import os.path as osp
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from avion_tpu.data.sampling import get_frame_ids, load_clip, strided_frame_ids
from avion_tpu.data.transforms import (
    sample_rrc,
    sample_msc,
    center_crop_spec,
    spatial_three_crops,
    tube_mask,
    tube_mask_batch,
)
from avion_tpu.data.datasets import (
    AugmentSpec,
    KineticsDataset,
    VideoCaptionDataset,
    collate,
)
from avion_tpu.data.loader import DataLoader

FPS = 10
CHUNK = 2  # seconds per chunk file


def _write_video(path, n_frames, w=64, h=48, value_offset=0):
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), FPS, (w, h))
    for i in range(n_frames):
        f = np.full((h, w, 3), min(255, value_offset + i * 2), np.uint8)
        vw.write(f)
    vw.release()


@pytest.fixture(scope="module")
def ego4d_root(tmp_path_factory):
    """Chunked layout: root/<vid>.mp4/<chunk_start>.mp4"""
    root = str(tmp_path_factory.mktemp("ego4d"))
    for vid in ("vid_a", "vid_b"):
        d = osp.join(root, f"{vid}.mp4")
        os.makedirs(d)
        for chunk in (0, 2, 4):  # 3 chunks of 2s @ 10fps = 60 frames total
            _write_video(osp.join(d, f"{chunk}.mp4"), CHUNK * FPS,
                         value_offset=chunk * 10)
    meta = osp.join(root, "meta.pkl")
    samples = [
        ("vid_a", 0.5, 3.5, "opens the drawer"),
        ("vid_b", 1.0, 5.0, ["washes hands", "rinses hands"]),
        ("vid_a", 4.0, 6.0, "closes the door"),
    ]
    with open(meta, "wb") as f:
        pickle.dump(samples, f)
    return root, meta


def test_get_frame_ids_matches_reference_formula():
    ref = np.convolve(np.linspace(10, 50, 9), [0.5, 0.5], "valid").astype(int)
    got = get_frame_ids(10, 50, num_segments=8, jitter=False)
    np.testing.assert_array_equal(got, ref)


def test_get_frame_ids_jitter_bounded():
    rng = np.random.RandomState(0)
    ids = get_frame_ids(0, 80, num_segments=8, jitter=True, rng=rng)
    assert len(ids) == 8
    assert all(-5 <= i <= 85 for i in ids)


def test_strided_frame_ids():
    ids = strided_frame_ids(100, 16, 4, random_shift=False)
    assert len(ids) == 16
    assert ids[1] - ids[0] == 4
    ids2 = strided_frame_ids(10, 16, 4, random_shift=False)
    assert max(ids2) == 9  # clamped


def test_load_clip_chunked(ego4d_root):
    root, _ = ego4d_root
    clip = load_clip(root, "vid_a", "mp4", 0.5, 3.5, chunk_len=CHUNK,
                     fps=FPS, clip_length=8, out_size=(32, 32))
    assert clip.shape == (8, 32, 32, 3)
    assert clip.dtype == np.uint8
    # frames span chunks 0 and 2s: brightness should increase
    assert clip[-1].mean() > clip[0].mean()


def test_load_clip_missing_chunk_walks_back(ego4d_root):
    root, _ = ego4d_root
    # end beyond last chunk: walks chunk_end back and still returns frames
    clip = load_clip(root, "vid_a", "mp4", 4.0, 40.0, chunk_len=CHUNK,
                     fps=FPS, clip_length=4, out_size=(32, 32))
    assert clip.shape == (4, 32, 32, 3)


def test_load_clip_missing_video_placeholder(ego4d_root):
    root, _ = ego4d_root
    clip = load_clip(root, "nope", "mp4", 0, 2, chunk_len=CHUNK, fps=FPS,
                     clip_length=4, out_size=(32, 32))
    assert clip.shape == (4, 32, 32, 3)
    assert clip.sum() == 0


def test_caption_dataset(ego4d_root):
    root, meta = ego4d_root
    ds = VideoCaptionDataset(
        "ego4d", root, meta, is_training=True, clip_length=4,
        chunk_len=CHUNK, fps=FPS,
        augment=AugmentSpec(crop_size=32, mode="rrc"),
    )
    assert len(ds) == 3
    item = ds[1]
    assert item["video"].shape == (4, 32, 32, 3)
    assert item["text"].shape == (77,)
    assert item["text"][0] == 49406


def test_loader_batches(ego4d_root):
    root, meta = ego4d_root
    ds = VideoCaptionDataset(
        "ego4d", root, meta, is_training=True, clip_length=4,
        chunk_len=CHUNK, fps=FPS,
        augment=AugmentSpec(crop_size=32),
    )
    loader = DataLoader(ds, batch_size=2, num_workers=0, shuffle=True)
    batches = list(loader)
    assert len(batches) == 1  # 3 samples, drop_last
    assert batches[0]["video"].shape == (2, 4, 32, 32, 3)
    assert batches[0]["text"].shape == (2, 77)


def test_loader_multiprocess(ego4d_root):
    root, meta = ego4d_root
    ds = VideoCaptionDataset(
        "ego4d", root, meta, is_training=False, clip_length=4,
        chunk_len=CHUNK, fps=FPS, augment=AugmentSpec(crop_size=32, mode="center"),
    )
    loader = DataLoader(ds, batch_size=1, num_workers=2, shuffle=False,
                        drop_last=False)
    batches = list(loader)
    loader.close()
    assert len(batches) == 3
    # determinism: eval items seeded by index
    again = ds[0]
    np.testing.assert_array_equal(batches[0]["video"][0], again["video"])


def test_rrc_bounds():
    rng = np.random.RandomState(0)
    for _ in range(50):
        c = sample_rrc(rng, (0.5, 1.0), hflip_prob=0.5)
        assert 0 <= c.x <= 1 and 0 <= c.y <= 1
        assert c.x + c.w <= 1.0001 and c.y + c.h <= 1.0001
        assert 0.3 <= c.w * c.h <= 1.0001


def test_msc_and_center_and_3crop():
    rng = np.random.RandomState(0)
    c = sample_msc(rng, 456, 256, input_size=224)
    assert 0 <= c.x and c.x + c.w <= 1.0001
    cc = center_crop_spec(456, 256)
    assert abs(cc.w * 456 - 256) < 2 and abs(cc.h - 1.0) < 1e-6
    crops = spatial_three_crops(456, 256)
    assert len(crops) == 3
    assert crops[0].x == 0 and crops[2].x + crops[2].w <= 1.0001


def test_tube_mask_counts():
    rng = np.random.RandomState(0)
    m = tube_mask(rng, frames=8, height=14, width=14, mask_ratio=0.9)
    assert m.shape == (8 * 196,)
    per_frame = m.reshape(8, 196)
    assert (per_frame.sum(1) == int(0.9 * 196)).all()
    np.testing.assert_array_equal(per_frame[0], per_frame[5])  # tube = same
    mb = tube_mask_batch(rng, 4, 8, 14, 14, 0.9)
    assert mb.shape == (4, 8 * 196)
    assert (mb.sum(1) == 8 * int(0.9 * 196)).all()


def test_kinetics_dataset(tmp_path):
    root = str(tmp_path)
    vids = []
    for i in range(2):
        p = osp.join(root, f"v{i}.mp4")
        _write_video(p, 40)
        vids.append(f"v{i}.mp4 1")
    meta = osp.join(root, "list.txt")
    open(meta, "w").write("\n".join(vids))
    ds = KineticsDataset(
        root, meta, clip_length=4, clip_stride=2, crop_size=32,
        patch_size=16, tubelet_size=2, mask_ratio=0.5,
        augment=AugmentSpec(crop_size=32, mode="msc", hflip_prob=0.5),
    )
    item = ds[0]
    assert item["video"].shape == (4, 32, 32, 3)
    assert item["mask"].shape == (2 * 4,)  # (4/2 frames) * (2*2 patches)
    assert item["mask"].sum() == 2 * int(0.5 * 4)


def test_kinetics_corrupt_file_resamples(tmp_path):
    """A corrupt video resamples another index instead of crashing
    (classification_dataset.py:205-211 semantics)."""
    root = str(tmp_path)
    good = osp.join(root, "good.mp4")
    _write_video(good, 20)
    bad = osp.join(root, "bad.mp4")
    open(bad, "wb").write(b"not a video")
    meta = osp.join(root, "list.txt")
    open(meta, "w").write("bad.mp4 0\ngood.mp4 1\n")
    ds = KineticsDataset(root, meta, clip_length=2, clip_stride=2,
                         crop_size=32, patch_size=16, tubelet_size=2,
                         mask_ratio=0.5,
                         augment=AugmentSpec(crop_size=32, mode="center"))
    item = ds[0]  # bad file -> falls through to the good one
    assert item["video"].shape == (2, 32, 32, 3)
    assert int(item["label"]) == 1


def test_three_crop_eval_views(tmp_path):
    root = str(tmp_path)
    _write_video(osp.join(root, "v0.mp4"), 30)
    meta = osp.join(root, "list.txt")
    open(meta, "w").write("v0.mp4 0\n")
    from avion_tpu.data.datasets import VideoClassyDataset

    ds = VideoClassyDataset(
        "kinetics", root, meta, is_training=False, clip_length=2,
        chunk_len=-1, num_clips=2, num_crops=3,
        augment=AugmentSpec(crop_size=32, mode="center"),
    )
    item = ds[0]
    # 2 temporal x 3 spatial views
    assert item["video"].shape == (6, 2, 32, 32, 3)


def test_loader_skip_batches(ego4d_root):
    root, meta = ego4d_root
    ds = VideoCaptionDataset(
        "ego4d", root, meta, is_training=False, clip_length=2,
        chunk_len=CHUNK, fps=FPS, augment=AugmentSpec(crop_size=32, mode="center"),
    )
    full = list(DataLoader(ds, 1, shuffle=False, drop_last=False,
                           num_workers=0))
    skipped = list(DataLoader(ds, 1, shuffle=False, drop_last=False,
                              num_workers=0, skip_batches=2))
    assert len(skipped) == len(full) - 2
    np.testing.assert_array_equal(skipped[0]["video"], full[2]["video"])


class _BigDataset:
    """Module-level so forkserver workers can unpickle it."""

    def __len__(self):
        return 12

    def __getitem__(self, i):
        rs = np.random.RandomState(i)
        return {
            "video": rs.randint(0, 255, (8, 128, 128, 3), np.uint8),
            "text": np.full((7,), i, np.int32),
            "idx": np.int64(i),
        }


def test_loader_shm_transfer_matches_pickle(tmp_path):
    """Shared-memory batch transfer: identical batches to the pickle
    path and to synchronous loading; no /dev/shm segments leak."""
    import gc
    import glob

    from avion_tpu.data.loader import _SHM_MIN_BYTES, DataLoader

    ds = _BigDataset()
    assert ds[0]["video"].nbytes * 4 >= _SHM_MIN_BYTES  # batch goes shm

    def run(**kw):
        dl = DataLoader(ds, 4, shuffle=False, num_workers=kw.pop("nw"),
                        seed=3, **kw)
        out = [{k: np.asarray(v).copy() for k, v in b.items()} for b in dl]
        dl.close()
        return out

    before = len(glob.glob("/dev/shm/*"))
    sync = run(nw=0)
    shm = run(nw=2, use_shm=True)
    pkl = run(nw=2, use_shm=False)
    assert len(sync) == len(shm) == len(pkl) == 3
    for a, b, c in zip(sync, shm, pkl):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
            np.testing.assert_array_equal(a[k], c[k])
    gc.collect()
    after = len(glob.glob("/dev/shm/*"))
    assert after <= before, (before, after)


def test_loader_shm_no_leak_on_early_exit():
    """Breaking out of iteration mid-epoch must reclaim shm segments
    held by already-prefetched batches (the workers unregister them
    from their resource_tracker, so only the main process can)."""
    import gc
    import glob

    from avion_tpu.data.loader import DataLoader

    before = set(glob.glob("/dev/shm/psm_*")) | set(glob.glob("/dev/shm/*"))
    dl = DataLoader(_BigDataset(), 4, shuffle=False, num_workers=2,
                    use_shm=True, prefetch_depth=3)
    it = iter(dl)
    next(it)  # prefetch queue now holds completed shm batches
    it.close()  # GeneratorExit path
    dl.close()
    gc.collect()
    import time
    time.sleep(0.2)
    after = set(glob.glob("/dev/shm/*"))
    assert not (after - before), (after - before)


def test_repeated_augmentation(tmp_path):
    """num_sample>1 yields independently-augmented views of each clip,
    flattened by collate so the batch has B * num_sample rows
    (classification_dataset.py:118-128,278-300 semantics)."""
    root = str(tmp_path)
    for i in range(4):
        # per-pixel noise so different random crops give different pixels
        vw = cv2.VideoWriter(osp.join(root, f"v{i}.mp4"),
                             cv2.VideoWriter_fourcc(*"mp4v"), FPS, (48, 48))
        for t in range(30):
            vw.write(np.random.RandomState(100 * i + t).randint(
                0, 255, (48, 48, 3), np.uint8))
        vw.release()
    meta = osp.join(root, "list.txt")
    open(meta, "w").write(
        "\n".join(f"v{i}.mp4 {i}" for i in range(4)))
    from avion_tpu.data.datasets import VideoClassyDataset, collate
    from avion_tpu.data.loader import DataLoader

    ds = VideoClassyDataset(
        "kinetics", root, meta, is_training=True, clip_length=2,
        chunk_len=-1, num_sample=2,
        augment=AugmentSpec(crop_size=16, mode="rrc"),
    )
    item = ds[0]
    assert isinstance(item, list) and len(item) == 2
    assert item[0]["label"] == item[1]["label"]
    assert item[0]["video"].shape == item[1]["video"].shape
    # different random crops -> (almost surely) different pixels
    assert not np.array_equal(item[0]["video"], item[1]["video"])

    batch = collate([ds[0], ds[1]])
    assert batch["video"].shape[0] == 4
    assert list(batch["label"]) == [0, 0, 1, 1]

    loader = DataLoader(ds, 2, shuffle=False, drop_last=True,
                        num_workers=0)
    b = next(iter(loader))
    assert b["video"].shape[0] == 4  # 2 items x 2 samples


def test_decode_fast_config_reachable(ego4d_root):
    """data.decode_fast overrides the is_training default (the lossy
    fast-decode profile must be opt-out-able for bit-exact parity with
    the reference decode path)."""
    from avion_tpu.core.config import TrainConfig

    cfg = TrainConfig().apply_overrides(["data.decode_fast=false"])
    assert cfg.data.decode_fast is False
    assert TrainConfig().data.decode_fast is None  # auto = is_training

    root, meta = ego4d_root
    aug = AugmentSpec(crop_size=32, mode="rrc")
    ds_auto = VideoCaptionDataset(
        "ego4d", root, meta, is_training=True, clip_length=2,
        chunk_len=CHUNK, fps=FPS, augment=aug)
    ds_off = VideoCaptionDataset(
        "ego4d", root, meta, is_training=True, clip_length=2,
        chunk_len=CHUNK, fps=FPS, augment=aug,
        decode_fast=cfg.data.decode_fast)
    assert ds_auto.decode_fast is True
    assert ds_off.decode_fast is False
    assert ds_off[0]["video"].shape == (2, 32, 32, 3)


# ---------------------------------------------------------------------------
# device_prefetch (threaded producer): ordering, exhaustion, error
# propagation, and early-close source cleanup
# ---------------------------------------------------------------------------


def test_device_prefetch_threaded_order_and_exhaustion(mesh_dp):
    from avion_tpu.data.loader import device_prefetch

    batches = [{"x": np.full((8, 2), i, np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(batches), mesh_dp, depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])


def test_device_prefetch_sync_order_and_exhaustion(mesh_dp):
    from avion_tpu.data.loader import device_prefetch

    batches = [{"x": np.full((8, 2), i, np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(batches), mesh_dp, depth=2,
                               threaded=False))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])


def test_device_prefetch_error_propagates(mesh_dp):
    """A loader exception (e.g. a decode failure) raised in the producer
    thread must surface in the train loop, not die silently."""
    from avion_tpu.data.loader import device_prefetch

    def src():
        yield {"x": np.zeros((8, 2), np.float32)}
        raise RuntimeError("decode boom")

    it = device_prefetch(src(), mesh_dp, depth=2)
    with pytest.raises(RuntimeError, match="decode boom"):
        for _ in range(3):
            next(it)


def test_device_prefetch_early_close_runs_source_cleanup(mesh_dp):
    """Closing the prefetch generator mid-epoch must run the source
    iterator's cleanup (shm reclamation lives in DataLoader.__iter__'s
    GeneratorExit handler)."""
    import time as _time

    from avion_tpu.data.loader import device_prefetch

    closed = []

    def src():
        try:
            for i in range(1000):
                yield {"x": np.full((8, 2), i, np.float32)}
        finally:
            closed.append(True)

    g = device_prefetch(src(), mesh_dp, depth=2)
    next(g)
    g.close()
    deadline = _time.time() + 10
    while not closed and _time.time() < deadline:
        _time.sleep(0.05)
    assert closed


def test_echo_batches_repeats_and_passthrough():
    from avion_tpu.data.loader import echo_batches

    src = [{"x": i} for i in range(3)]
    assert list(echo_batches(iter(src), 1)) == src
    out = list(echo_batches(iter(src), 3))
    assert len(out) == 9
    # each batch repeats consecutively and is the SAME object (the
    # on-device array reuse the technique depends on)
    for i, b in enumerate(src):
        assert all(out[3 * i + k] is b for k in range(3))
