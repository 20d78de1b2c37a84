"""Data-layer tests: grid contract, splits, rotation math, determinism."""

import numpy as np
import pytest

from gppvae_tpu.data import build_faceplace, build_rotated_digits
from gppvae_tpu.data.dataset import make_grid_split
from gppvae_tpu.data.transforms import rotate_bilinear


def test_rotate_identity_and_periodicity():
    rng = np.random.default_rng(0)
    img = np.zeros((1, 24, 24), np.float32)
    img[0, 8:16, 8:16] = rng.random((8, 8)).astype(np.float32)
    out0 = rotate_bilinear(img, np.zeros(1))
    np.testing.assert_allclose(out0, img, atol=1e-6)
    # four quarter-turns return the original (interior content, exact for 90°)
    out = img
    for _ in range(4):
        out = rotate_bilinear(out, np.full(1, np.pi / 2))
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_rotate_90_exact():
    img = np.zeros((1, 16, 16), np.float32)
    img[0, 4, 6] = 1.0
    out = rotate_bilinear(img, np.full(1, np.pi / 2))
    # 90° CCW about center maps (y=4, x=6) somewhere with mass conserved
    np.testing.assert_allclose(out.sum(), 1.0, atol=1e-5)
    assert out[0, np.argmax(out[0].max(1)), np.argmax(out[0].max(0))] > 0.99


def test_grid_split_properties():
    P, Q = 50, 8
    tr, va, ho = make_grid_split(P, Q, heldout_per_object=2, val_fraction=0.1, seed=3)
    assert len(tr) + len(va) + len(ho) == P * Q
    assert len(ho) == 2 * P
    # held-out cells: exactly 2 per object
    counts = np.bincount(ho // Q, minlength=P)
    assert (counts == 2).all()
    # determinism
    tr2, va2, ho2 = make_grid_split(P, Q, heldout_per_object=2, val_fraction=0.1, seed=3)
    np.testing.assert_array_equal(tr, tr2)
    np.testing.assert_array_equal(ho, ho2)


@pytest.mark.parametrize("source", ["synthetic", "sklearn"])
def test_build_rotated_digits(source, tmp_path):
    ds = build_rotated_digits(
        source, num_objects=12, num_views=8, image_size=32, seed=1,
        cache_dir=str(tmp_path),
    )
    assert ds.images.shape == (96, 32, 32, 1)
    assert ds.images.min() >= 0.0 and ds.images.max() <= 1.0
    assert ds.num_objects == 12 and ds.num_views == 8
    # row-major grid layout: n = d*Q + q
    np.testing.assert_array_equal(ds.object_ids[:8], 0)
    np.testing.assert_array_equal(ds.view_ids[:8], np.arange(8))
    # view 0 must be the unrotated base: nonzero content
    assert ds.images[0].sum() > 1.0
    # angles evenly spaced
    np.testing.assert_allclose(np.diff(ds.view_aux[:, 0]), 2 * np.pi / 8, rtol=1e-5)
    # cache round-trip
    ds2 = build_rotated_digits(
        source, num_objects=12, num_views=8, image_size=32, seed=1,
        cache_dir=str(tmp_path),
    )
    np.testing.assert_array_equal(ds.images, ds2.images)
    np.testing.assert_array_equal(ds.train_idx, ds2.train_idx)


def test_rotated_digits_views_are_rotations():
    ds = build_rotated_digits("synthetic", num_objects=3, num_views=4, seed=0)
    base = ds.images[0, :, :, 0][None]
    q2 = rotate_bilinear(base, np.full(1, np.pi))  # view 2 of 4 = 180°
    np.testing.assert_allclose(q2[0], ds.images[2, :, :, 0], atol=1e-3)


def test_synthetic_faces_grid():
    ds = build_faceplace("synthetic", num_people=6, num_poses=5, image_size=32, seed=0)
    assert ds.images.shape == (30, 32, 32, 3)
    assert ds.num_objects == 6 and ds.num_views == 5
    # identity varies across people, pose varies across views
    p0v0, p1v0 = ds.images[0], ds.images[5]
    p0v4 = ds.images[4]
    assert np.abs(p0v0 - p1v0).mean() > 0.005
    assert np.abs(p0v0 - p0v4).mean() > 0.005


def test_faceplace_h5_roundtrip(tmp_path):
    import h5py

    P, Q, S = 4, 3, 16
    rng = np.random.default_rng(0)
    imgs = (rng.random((P * Q, S, S, 3)) * 255).astype(np.uint8)
    obj = np.repeat(np.arange(P) * 7, Q)  # sparse ids — must be re-densified
    view = np.tile(np.arange(Q) + 2, P)
    path = tmp_path / "faces.h5"
    with h5py.File(path, "w") as f:
        f["images"] = imgs
        f["person"] = obj
        f["pose"] = view
    ds = build_faceplace(f"h5:{path}")
    assert ds.images.shape == (P * Q, S, S, 3)
    assert ds.num_objects == P and ds.num_views == Q
    assert ds.images.max() <= 1.0


def test_mnist_idx_roundtrip(tmp_path):
    """Write a synthetic idx pair, load through the mnist:<dir> source."""
    import gzip
    import struct

    from gppvae_tpu.data.mnist_idx import load_mnist_train, read_idx

    rng = np.random.default_rng(0)
    imgs = (rng.random((40, 28, 28)) * 255).astype(np.uint8)
    labels = np.full((40,), 3, dtype=np.uint8)

    def write_idx(path, arr, gz=False):
        op = gzip.open if gz else open
        with op(path, "wb") as f:
            f.write(struct.pack(">HBB", 0, 0x08, arr.ndim))
            f.write(struct.pack(">" + "I" * arr.ndim, *arr.shape))
            f.write(arr.tobytes())

    write_idx(tmp_path / "train-images-idx3-ubyte", imgs)
    write_idx(tmp_path / "train-labels-idx1-ubyte.gz", labels, gz=True)

    images, lab = load_mnist_train(str(tmp_path))
    assert images.shape == (40, 28, 28)
    np.testing.assert_allclose(images, imgs / 255.0, atol=1e-7)
    np.testing.assert_array_equal(lab, 3)

    ds = build_rotated_digits(
        f"mnist:{tmp_path}", digit=3, num_objects=10, num_views=4, seed=0
    )
    assert ds.images.shape == (40, 32, 32, 1)

    # corrupt magic → named error
    (tmp_path / "bad").write_bytes(b"\x01\x02\x03\x04rest")
    with pytest.raises(ValueError, match="not an IDX file"):
        read_idx(str(tmp_path / "bad"))


def test_faceplace_h5_drops_incomplete_view_column(tmp_path):
    """A view missing for every subject must be dropped (largest complete
    sub-grid), not crash the loader."""
    import h5py

    P, Q, S = 4, 4, 16
    rng = np.random.default_rng(1)
    rows = [(d, q) for d in range(P) for q in range(Q) if q != 2]
    imgs = (rng.random((len(rows), S, S, 3)) * 255).astype(np.uint8)
    path = tmp_path / "faces.h5"
    with h5py.File(path, "w") as f:
        f["images"] = imgs
        f["person"] = np.array([d for d, _ in rows])
        f["pose"] = np.array([q for _, q in rows])
    ds = build_faceplace(f"h5:{path}")
    assert ds.num_objects == P and ds.num_views == Q - 1
    assert ds.images.shape == (P * (Q - 1), S, S, 3)


def test_grid_split_never_orphans_an_object():
    """Random val carving must not consume an object's LAST trainable view
    (Q=2, heldout=1 leaves one view per object; a 50% val fraction would
    orphan ~half the objects without the demotion guard)."""
    from gppvae_tpu.data.dataset import make_grid_split

    P, Q = 6, 2
    for seed in range(5):
        train, val, heldout = make_grid_split(
            P, Q, heldout_per_object=1, val_fraction=0.5, seed=seed
        )
        assert len(np.unique(np.concatenate([train, val, heldout]))) == P * Q
        train_objs = set((train // Q).tolist())
        assert train_objs == set(range(P)), (
            f"seed {seed}: objects {set(range(P)) - train_objs} have no "
            "training rows"
        )


def test_faceplace_h5_explicit_image_size_resizes(tmp_path):
    import h5py

    P, Q, S = 3, 3, 16
    rng = np.random.default_rng(0)
    with h5py.File(tmp_path / "f.h5", "w") as f:
        f["images"] = (rng.random((P * Q, S, S, 3)) * 255).astype(np.uint8)
        f["person"] = np.repeat(np.arange(P), Q)
        f["pose"] = np.tile(np.arange(Q), P)
    # default: native size preserved (the pinned h5 contract)
    ds = build_faceplace(f"h5:{tmp_path / 'f.h5'}")
    assert ds.image_shape == (S, S, 3)
    # explicit size: nearest-neighbor resample (was silently dead code)
    ds8 = build_faceplace(f"h5:{tmp_path / 'f.h5'}", image_size=8)
    assert ds8.image_shape == (8, 8, 3)
    np.testing.assert_allclose(ds8.images[0, 0, 0], ds.images[0, 0, 0])
