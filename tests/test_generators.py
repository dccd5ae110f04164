"""Raw-data -> HDF5 generators, round-tripped through the real readers."""

import numpy as np
import pytest

from contouring_uncertainty_tpu.data.camus import CamusContourData
from contouring_uncertainty_tpu.data.config import Label, Tags
from contouring_uncertainty_tpu.data.generators import (
    generate_camus,
    generate_jsrt,
    read_mhd,
    write_mhd,
)
from contouring_uncertainty_tpu.data.lung import JSRTContourData, N_POINTS
from contouring_uncertainty_tpu.data.synthetic import make_sample


def test_mhd_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (3, 16, 20)).astype(np.uint8)
    for compressed in (False, True):
        p = tmp_path / f"x_{compressed}.mhd"
        write_mhd(p, arr, spacing=(0.5, 0.7, 1.0), compressed=compressed)
        back, spacing = read_mhd(p)
        np.testing.assert_array_equal(back, arr)
        assert spacing == (0.5, 0.7, 1.0)
    # uint16 roundtrip (JSRT-style dynamic range)
    arr16 = rng.integers(0, 4096, (2, 8, 8)).astype(np.uint16)
    p = tmp_path / "y.mhd"
    write_mhd(p, arr16, element_type="MET_USHORT")
    back, _ = read_mhd(p)
    np.testing.assert_array_equal(back, arr16)


def _fake_raw_camus(root, patients=("patient0001", "patient0002"), n_frames=6):
    """Raw CAMUS download layout with LV-like synthetic anatomy."""
    (root / "listSubGroups").mkdir(parents=True)
    for fold in (1, 5):
        for subset, pats in (("training", patients[:1]),
                             ("validation", patients[1:]),
                             ("testing", patients[1:])):
            (root / "listSubGroups" / f"subGroup{fold}_{subset}.txt").write_text(
                "\n".join(pats) + "\n")
    rng = np.random.default_rng(3)
    for pid in patients:
        pdir = root / pid
        pdir.mkdir()
        for view in ("2CH", "4CH"):
            imgs, gts = [], []
            for i in range(n_frames):
                img, gt, _ = make_sample(rng, size=512)
                imgs.append((img * 255).astype(np.uint8))
                gts.append(gt.astype(np.uint8))
            write_mhd(pdir / f"{pid}_{view}_half_sequence.mhd",
                      np.stack(imgs), spacing=(0.31, 0.15, 1.0))
            write_mhd(pdir / f"{pid}_{view}_half_sequence_gt.mhd",
                      np.stack(gts), spacing=(0.31, 0.15, 1.0))
            (pdir / f"Info_{view}.cfg").write_text(
                f"ED: 1\nES: {n_frames}\nNbFrame: {n_frames}\n"
                "ImageQuality: Good\n")


def test_generate_camus_roundtrip(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    _fake_raw_camus(raw)
    out = tmp_path / "camus.h5"
    generate_camus(raw, out, folds=(1, 5))

    data = CamusContourData(out, fold=5, labels=(Label.BG, Label.LV),
                            cache_dir=tmp_path)
    arrays = data.train_arrays("train")
    assert arrays[Tags.img].shape[1:] == (1, 256, 256)
    assert arrays[Tags.img].shape[0] == 4  # 1 patient x 2 views x ED/ES
    assert arrays[Tags.contour].shape[1:] == (21, 2)
    assert 0.0 <= arrays[Tags.img].min() and arrays[Tags.img].max() <= 1.0

    views = data.load_split("test")
    assert len(views) == 2
    v = views[0]
    assert v.instants == {"ED": 0, "ES": 1}
    assert v.image_quality == "Good"
    # voxelspacing written reversed (x, y, z) like the reference generator
    np.testing.assert_allclose(v.voxelspacing, [1.0, 0.15, 0.31], atol=1e-6)
    # full-res gt kept alongside processed stacks
    import h5py

    with h5py.File(out, "r") as f:
        g = f["patient0002/2CH"]
        assert g["gt"].shape[1:] == (512, 512)
        assert g["gt_proc"].shape[1:] == (256, 256)
        assert g["img_proc"].shape[1:] == (256, 256, 1)
        assert set(np.unique(g["gt_proc"])) <= {0, 1, 2, 3}


def test_generate_camus_full_sequence(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    _fake_raw_camus(raw, n_frames=5)
    out = tmp_path / "camus_seq.h5"
    generate_camus(raw, out, folds=(5,), sequence=True)
    data = CamusContourData(out, fold=5, use_sequence=True, cache_dir=tmp_path)
    arrays = data.train_arrays("train")
    assert arrays[Tags.img].shape[0] == 10  # 1 patient x 2 views x 5 frames
    v = data.load_split("train")[0]
    assert v.instants == {"ED": 0, "ES": 4}


def _fake_jsrt(root, ids=("JPCLN001", "JPCLN002")):
    rng = np.random.default_rng(5)
    (root / "All247images").mkdir(parents=True)
    for split, cap, split_ids in (("train", "Train", ids),
                                  ("val", "Val", ids[:1]),
                                  ("test", "Test", ids[1:])):
        (root / f"{split}_files.txt").write_text(
            "\n".join(f"{i}.IMG" for i in split_ids) + "\n")
        lm = root / cap / "landmarks"
        lm.mkdir(parents=True, exist_ok=True)
        for i in split_ids:
            # plausible landmark layout in 1024-res coordinates
            t = np.linspace(0, 2 * np.pi, N_POINTS, endpoint=False)
            pts = np.stack([512 + 250 * np.cos(t), 512 + 300 * np.sin(t)], -1)
            pts += rng.normal(0, 4, pts.shape)
            np.save(lm / f"{i}.npy", pts.astype(np.float64))
    for i in ids:
        img = rng.integers(0, 4096, (2048, 2048)).astype(">u2")
        (root / "All247images" / f"{i}.IMG").write_bytes(img.tobytes())


def test_generate_jsrt_roundtrip(tmp_path):
    raw = tmp_path / "hybridnet-jsrt"
    raw.mkdir()
    _fake_jsrt(raw)
    out = tmp_path / "jsrt_contour.h5"
    generate_jsrt(raw, out)

    data = JSRTContourData(out)
    arrays = data.train_arrays("train")
    assert arrays[Tags.img].shape == (2, 1, 256, 256)
    assert arrays[Tags.contour].shape == (2, N_POINTS, 2)
    assert arrays[Tags.gt].shape == (2, 256, 256)
    assert set(np.unique(arrays[Tags.gt])) <= {0, 1, 2, 3}
    # landmarks land inside the resized image
    assert arrays[Tags.contour].min() >= 0
    assert arrays[Tags.contour].max() <= 256
    # intensity inversion: raw 4095 -> ~0, raw 0 -> 255 (scaled to [0,1])
    assert 0.0 <= arrays[Tags.img].min() and arrays[Tags.img].max() <= 1.0
    assert len(list(data.predict_views("test"))) == 1


def test_generate_camus_reverses_es_before_ed(tmp_path):
    """Views whose info file puts ES before ED must be written in
    chronological ED->ES order (generator.py:221-228)."""
    import h5py

    root = tmp_path / "raw"
    (root / "listSubGroups").mkdir(parents=True)
    for subset in ("training", "validation", "testing"):
        (root / "listSubGroups" / f"subGroup5_{subset}.txt").write_text("p1\n")
    rng = np.random.default_rng(7)
    pdir = root / "p1"
    pdir.mkdir()
    frames, gts = [], []
    for i in range(4):
        img, gt, _ = make_sample(rng, size=256)
        frames.append((img * 255).astype(np.uint8))
        gts.append(gt.astype(np.uint8))
    # mark frame 0 and 3 distinguishably via the image mean
    frames[0][:] = 10
    frames[3][:] = 240
    write_mhd(pdir / "p1_2CH_half_sequence.mhd", np.stack(frames))
    write_mhd(pdir / "p1_2CH_half_sequence_gt.mhd", np.stack(gts))
    # ES first (frame 1 -> index 0), ED last (frame 4 -> index 3)
    (pdir / "Info_2CH.cfg").write_text("ED: 4\nES: 1\nNbFrame: 4\n")

    out = tmp_path / "rev.h5"
    generate_camus(root, out, folds=(5,))
    with h5py.File(out, "r") as f:
        g = f["p1/2CH"]
        assert g.attrs["ED"] == 0 and g.attrs["ES"] == 1
        # original frame 3 (bright) was ED -> now first; frame 0 (dark) was ES
        imgs = np.asarray(g["img_proc"])
        assert imgs[0].mean() > imgs[1].mean()
        assert abs(imgs[0].mean() - 240) < 2 and abs(imgs[1].mean() - 10) < 2
