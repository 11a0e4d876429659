import numpy as np
import pytest

from nopesac_tpu.data.loader import PairLoader
from nopesac_tpu.data.mapper import PairMapper, collate
from nopesac_tpu.data.packing import unpack_targets, unpack_targets_np
from nopesac_tpu.data.synthetic import make_dataset, make_pair, _warp_plane_np, FLIP


class TestSynthetic:
    def test_pair_schema(self):
        rng = np.random.default_rng(0)
        pair = make_pair(rng, n_planes=5, h=96, w=128)
        for i in ("0", "1"):
            assert len(pair[i]["annotations"]) == 5
            assert "plane" in pair[i]["annotations"][0]
        assert len(pair["gt_corrs"]) == 5
        assert abs(np.linalg.norm(pair["rel_pose"]["rotation"]) - 1) < 1e-6

    def test_geometric_consistency(self):
        """view-1 params warped by identity must equal view-0 warped by pose."""
        rng = np.random.default_rng(1)
        pair = make_pair(rng, n_planes=4)
        q = np.asarray(pair["rel_pose"]["rotation"])
        t = np.asarray(pair["rel_pose"]["position"])
        for a0, a1 in zip(pair["0"]["annotations"], pair["1"]["annotations"]):
            g_from0 = _warp_plane_np(np.asarray(a0["plane"]), q, t)
            g_from1 = FLIP * np.asarray(a1["plane"])
            np.testing.assert_allclose(g_from0, g_from1, atol=1e-5)


class TestMapper:
    def test_train_sample_shapes(self):
        data = make_dataset(2, n_planes=5, h=96, w=128)
        mapper = PairMapper(is_train=True, dataset_kind="mp3d", image_size=(96, 128))
        s = mapper(data[0])
        assert s["image0"].shape == (96, 128, 3)
        t = unpack_targets_np(s["targets0"])
        assert t["gt_valid"].shape == (50,) and t["gt_valid"].sum() == 5
        assert s["targets0"]["gt_masks_packed"].shape == (50, 96, 128 // 8)
        assert t["gt_masks"].shape == (50, 96, 128)
        assert t["gt_masks"][0].sum() > 0
        assert t["gt_params"].shape == (50, 3)
        assert np.linalg.norm(t["gt_params"][0]) > 0
        # centers should be inside the unit square and inside the mask bbox
        assert (t["gt_centers"][:5] > 0).all() and (t["gt_centers"][:5] < 1).all()
        assert s["gt_pose"].shape == (7,)
        assert s["gt_pose"][3] >= 0  # w canonicalised
        assert s["corr_valid"].sum() == 5

    def test_idempotent_on_in_memory_images(self):
        """The mapper normalises images in place on a fresh copy - the stored
        in-memory dataset image must NOT be mutated across repeated calls."""
        data = make_dataset(1, n_planes=3, h=96, w=128)
        mapper = PairMapper(is_train=True, dataset_kind="mp3d", image_size=(96, 128))
        before = np.array(data[0]["0"]["image"], np.float32)
        s1 = mapper(data[0])
        np.testing.assert_array_equal(np.asarray(data[0]["0"]["image"], np.float32), before)
        s2 = mapper(data[0])
        np.testing.assert_array_equal(s1["image0"], s2["image0"])

    def test_overlap_resolution_and_centers(self):
        """Overlapping annotation masks resolve first-wins; centers and the
        pixel-center map match the reference's brute-force per-pixel formula
        (prepare_targets:498-507)."""
        from nopesac_tpu.utils import rle as rle_util

        h, w = 32, 40
        m0 = np.zeros((h, w), np.uint8); m0[4:20, 4:24] = 1
        m1 = np.zeros((h, w), np.uint8); m1[10:28, 12:36] = 1  # overlaps m0
        view = {
            "image_id": "synth_x", "height": h, "width": w,
            "annotations": [
                {"segmentation": rle_util.encode(m), "plane": [0.0, 0.0, float(k + 1)]}
                for k, m in enumerate((m0, m1))
            ],
        }
        mapper = PairMapper(is_train=True, dataset_kind="mp3d", image_size=(h, w))
        t = unpack_targets_np(mapper.view_targets(view))
        got = t["gt_masks"][:2]
        # first annotation wins on the overlap
        np.testing.assert_array_equal(got[0], m0)
        np.testing.assert_array_equal(got[1], m1 & ~m0)
        assert (got.sum(0) <= 1).all()
        # brute-force center formula on the resolved masks
        ys = (np.arange(h, dtype=np.float32) / h)[None, :, None]
        xs = (np.arange(w, dtype=np.float32) / w)[None, None, :]
        mf = got.astype(np.float32)
        areas = mf.sum(axis=(1, 2)) + 1e-10
        np.testing.assert_allclose(
            t["gt_centers"][:2, 0], (mf * xs).sum(axis=(1, 2)) / areas, atol=1e-6)
        np.testing.assert_allclose(
            t["gt_centers"][:2, 1], (mf * ys).sum(axis=(1, 2)) / areas, atol=1e-6)
        pc = np.zeros((h, w, 2), np.float32)
        for i in range(2):
            pc[got[i] > 0] = t["gt_centers"][i]
        np.testing.assert_allclose(t["gt_pixel_centers"], pc, atol=1e-6)

    def test_eval_sample_no_targets(self):
        data = make_dataset(1, n_planes=3, h=96, w=128)
        mapper = PairMapper(is_train=False, dataset_kind="mp3d", image_size=(96, 128))
        s = mapper(data[0])
        assert "targets0" not in s
        assert "image0" in s and "meta" in s

    def test_collate(self):
        data = make_dataset(3, n_planes=4, h=96, w=128)
        mapper = PairMapper(is_train=True, dataset_kind="mp3d", image_size=(96, 128))
        batch = collate([mapper(d) for d in data])
        assert batch["image0"].shape == (3, 96, 128, 3)
        assert batch["targets1"]["gt_masks_packed"].shape == (3, 50, 96, 128 // 8)
        assert len(batch["meta"]) == 3

    def test_wire_format_roundtrip(self):
        """Device unpack (jnp) == host unpack (np) == the classic target
        keys the criterion consumes; ray map matches _np_coordinate_map."""
        import jax

        from nopesac_tpu.data.mapper import _np_coordinate_map

        data = make_dataset(1, n_planes=4, h=96, w=128)
        mapper = PairMapper(is_train=True, dataset_kind="mp3d", image_size=(96, 128))
        wire = mapper(data[0])["targets0"]
        t_np = unpack_targets_np(wire)
        t_dev = jax.tree_util.tree_map(
            np.asarray, unpack_targets({k: np.asarray(v) for k, v in wire.items()}))
        for k in ("gt_masks", "gt_pixel_centers", "k_inv_dot_xy1"):
            np.testing.assert_allclose(t_np[k], t_dev[k], atol=1e-5, err_msg=k)
        np.testing.assert_allclose(
            t_np["k_inv_dot_xy1"], _np_coordinate_map(96, 128), atol=1e-5)
        # masks round-trip exactly; pixel centers match the per-mask scatter
        assert t_np["gt_masks"].dtype == np.uint8
        assert (np.unique(t_np["gt_masks"]) <= 1).all()
        pc = np.zeros((96, 128, 2), np.float32)
        for i in range(4):
            pc[t_np["gt_masks"][i] > 0] = t_np["gt_centers"][i]
        np.testing.assert_allclose(t_np["gt_pixel_centers"], pc, atol=1e-5)
        # passthrough: an already-unpacked dict is returned unchanged
        again = unpack_targets_np(t_np)
        assert set(again) == set(t_np)


class TestMp3dObservationPickle:
    """Real-format MP3D fixture: observations/<house>/<img>.pkl with
    semantic_sensor/depth_sensor arrays + the dataset's absolute-path
    prefix rewrite (planercnn_transforms.py:213-263). This is the branch
    the released datasets exercise; round-3 verdict flagged it untested."""

    H, W = 96, 128

    def _fixture(self, tmp_path, n_planes=3):
        import pickle

        from PIL import Image

        from nopesac_tpu.data.mapper import MP3D_PATH_PREFIX

        h, w = self.H, self.W
        root = tmp_path / "mp3d_root"
        house, img0, img1 = "houseA", "img_000", "img_001"
        rng = np.random.default_rng(11)

        def build_view(img_id):
            # disjoint vertical-band semantic ids 5,9,13 (NOT contiguous:
            # the mapper must key on sorted-unique nonzero ids, not 1..n)
            sem = np.zeros((h, w), np.int32)
            bandw = w // (n_planes + 1)
            ids = [5 + 4 * i for i in range(n_planes)]
            for i, sid in enumerate(ids):
                sem[:, i * bandw:(i + 1) * bandw] = sid
            depth = rng.uniform(1.0, 5.0, size=(h, w)).astype(np.float32)
            obs_dir = root / "observations" / house
            obs_dir.mkdir(parents=True, exist_ok=True)
            with open(obs_dir / f"{img_id}.pkl", "wb") as f:
                pickle.dump({"semantic_sensor": sem,
                             "depth_sensor": depth,
                             "color_sensor": np.zeros((h, w, 4), np.uint8)}, f)
            # rgb file under the new root; file_name carries the ORIGINAL
            # cluster prefix that the mapper must rewrite to root_dir
            rgb_dir = root / "rgb" / house
            rgb_dir.mkdir(parents=True, exist_ok=True)
            rgb = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
            Image.fromarray(rgb).save(rgb_dir / f"{img_id}.png")
            annos = [{"bbox": [0, 0, w - 1, h - 1], "bbox_mode": 0,
                      "category_id": 0,
                      "plane": [float(v) for v in rng.normal(size=3)]}
                     for _ in ids]
            return {
                "image_id": f"{house}_{img_id}",
                "file_name": f"{MP3D_PATH_PREFIX}rgb/{house}/{img_id}.png",
                "height": h, "width": w,
                "annotations": annos,
            }, sem, depth, rgb

        v0, sem0, depth0, rgb0 = build_view(img0)
        v1, sem1, depth1, rgb1 = build_view(img1)
        q = np.asarray([1.0, 0, 0, 0])
        pair = {"0": v0, "1": v1,
                "rel_pose": {"position": [0.1, 0.0, 0.2],
                             "rotation": [float(x) for x in q]},
                "gt_corrs": [[0, 0], [1, 1]]}
        return str(root) + "/", pair, (sem0, depth0, rgb0)

    def test_obs_pickle_masks_depth_and_prefix_rewrite(self, tmp_path):
        root, pair, (sem0, depth0, rgb0) = self._fixture(tmp_path)
        mapper = PairMapper(is_train=True, dataset_kind="mp3d",
                            root_dir=root, image_size=(self.H, self.W))
        s = mapper(pair)
        t = unpack_targets_np(s["targets0"])
        # masks come from the semantic map (ascending unique nonzero ids)
        ids = np.unique(sem0)
        ids = ids[ids != 0]
        assert t["gt_valid"].sum() == len(ids)
        for i, sid in enumerate(ids):
            np.testing.assert_array_equal(
                t["gt_masks"][i].astype(bool), sem0 == sid)
        # depth comes from depth_sensor, not the zero fallback
        np.testing.assert_allclose(t["depth"], depth0, rtol=1e-6)
        # params follow annotation order
        np.testing.assert_allclose(
            t["gt_params"][:len(ids)],
            np.asarray([a["plane"] for a in pair["0"]["annotations"]],
                       np.float32), rtol=1e-6)
        # the image was read through the path-prefix rewrite (non-zero,
        # and un-normalises back to the written rgb)
        img = s["image0"] * mapper.pixel_std + mapper.pixel_mean
        np.testing.assert_allclose(img, rgb0.astype(np.float32), atol=0.51)

    def test_missing_pickle_falls_back_to_annotations(self, tmp_path):
        root, pair, _ = self._fixture(tmp_path)
        pair["0"]["image_id"] = "houseA_img_999"  # no such observation
        pair["0"]["annotations"] = []
        mapper = PairMapper(is_train=True, dataset_kind="mp3d",
                            root_dir=root, image_size=(self.H, self.W))
        t = unpack_targets_np(mapper(pair)["targets0"])
        assert t["gt_valid"].sum() == 0  # annotation fallback, no masks


class TestLoader:
    def test_iteration_and_shard(self):
        data = make_dataset(8, n_planes=3, h=96, w=128)
        mapper = PairMapper(is_train=True, dataset_kind="mp3d", image_size=(96, 128))
        loader = PairLoader(data, mapper, batch_size=2, shuffle=True, seed=1)
        batches = list(loader)
        assert len(batches) == 4
        # sharded loader sees half the data
        loader2 = PairLoader(data, mapper, batch_size=2, num_shards=2, shard_id=0)
        assert len(list(loader2)) == 2


def test_loader_worker_pool():
    """num_workers>0 maps samples in a fork pool (DATALOADER.NUM_WORKERS
    semantics, reference Base.yaml:30); batches identical to the in-thread
    path."""
    from nopesac_tpu.data.loader import PairLoader
    from nopesac_tpu.data.mapper import PairMapper
    from nopesac_tpu.data.synthetic import make_dataset

    data = make_dataset(n_pairs=4, n_planes=3, h=64, w=96, seed=11)
    mapper = PairMapper(is_train=True, dataset_kind="mp3d", image_size=(64, 96))
    kw = dict(batch_size=2, shuffle=False, drop_last=True, infinite=False)
    batches0 = list(PairLoader(data, mapper, num_workers=0, **kw))
    batches2 = list(PairLoader(data, mapper, num_workers=2, **kw))
    assert len(batches0) == len(batches2) == 2
    for b0, b2 in zip(batches0, batches2):
        for k in b0:
            if k == "meta":
                continue
            if isinstance(b0[k], dict):
                for sk in b0[k]:
                    np.testing.assert_array_equal(b0[k][sk], b2[k][sk])
            else:
                np.testing.assert_array_equal(b0[k], b2[k])


def test_loader_worker_pool_augmentation_advances():
    """Regression: pool.map used to pickle the mapper (and its _aug_rng)
    per call, FREEZING augmentation — every batch replayed identical draws.
    Per-item seeds must give different draws across batches and match the
    in-thread path exactly."""
    from nopesac_tpu.data.loader import PairLoader
    from nopesac_tpu.data.mapper import PairMapper
    from nopesac_tpu.data.synthetic import make_dataset

    # 4 copies of the SAME pair: any inter-batch image difference can only
    # come from augmentation randomness
    # 64x96: the smallest shape where the synthetic renderer emits
    # non-black images (augmentation on all-zeros is a no-op)
    data = make_dataset(n_pairs=1, n_planes=3, h=64, w=96, seed=3) * 4
    mapper = PairMapper(is_train=True, dataset_kind="mp3d",
                        image_size=(64, 96), augmentation=True)
    kw = dict(batch_size=1, shuffle=False, drop_last=True, infinite=False)
    pooled = list(PairLoader(data, mapper, num_workers=2, seed=7, **kw))
    assert len(pooled) == 4
    imgs = [b["image0"][0] for b in pooled]
    # augmentation draws differ across items (RNG not frozen)
    assert any(not np.array_equal(imgs[0], im) for im in imgs[1:])
    # and the pool path matches the in-thread path draw-for-draw
    inline = list(PairLoader(data, mapper, num_workers=0, seed=7, **kw))
    for bp, bi in zip(pooled, inline):
        np.testing.assert_array_equal(bp["image0"], bi["image0"])


def test_producer_exception_surfaces_not_hangs():
    """A mapper that raises must surface the error to the consumer instead
    of killing the producer thread silently (the consumer then blocked in
    q.get() forever — round-5 liveness bug found by the scannet config
    smoke test)."""
    import pytest

    from nopesac_tpu.data.loader import PairLoader

    def bad_mapper(d, aug_seed=None):
        raise ValueError("boom")

    loader = PairLoader([{"x": 1}, {"x": 2}], bad_mapper, batch_size=2,
                        shuffle=False, drop_last=False, num_workers=0)
    with pytest.raises(RuntimeError, match="producer failed"):
        next(iter(loader))
