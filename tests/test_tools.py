import numpy as np
import pytest


class TestGeoConsistency:
    def test_perfect_pairs_zero_loss(self):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
        from tools.sparseplane_planeloss import GeoConsistencyLoss
        from nopesac_tpu.utils.np_geometry import SUNCG_TO_HABITAT, plane_params_to_local

        rng = np.random.default_rng(0)
        q = rng.normal(size=4); q /= np.linalg.norm(q)
        t = rng.normal(size=3) * 0.3
        planes0 = rng.normal(size=(5, 3)) + np.array([0, 0, 2.0])
        # view-1 params so that global frames agree
        from nopesac_tpu.utils.np_geometry import plane_params_to_global

        glob = plane_params_to_global(planes0, t, q)
        planes1 = glob * SUNCG_TO_HABITAT

        gel = GeoConsistencyLoss("cpu")
        cam = {"position": t, "rotation": q}
        batched = [{"gt_corrs": [[i, i] for i in range(5)]}]
        out = gel.forward(batched, [{"pred_plane": planes0}], [{"pred_plane": planes1}], [cam])
        assert out["geo_consistency_loss"] < 1e-6

    def test_inference_distances(self):
        from tools.sparseplane_planeloss import GeoConsistencyLoss

        gel = GeoConsistencyLoss("cpu")
        cam = {"position": [0, 0, 0], "rotation": [1, 0, 0, 0]}
        p = np.array([[1.0, 0, 0], [0, 2.0, 0]])
        dists, n1, n2 = gel.inference([{"pred_plane": p}], [{"pred_plane": p}], [cam], "l2")
        assert dists["l2"].shape == (1, 2, 2)


class TestScanNetGenerator:
    def test_plane_depths_on_plane(self):
        from tools.generate_scannetv2_data import calc_plane_depths

        camera = np.array([500.0, 500.0, 320.0, 240.0])
        # plane with normal +y in scannet fit frame maps to (0,-0?) via the
        # permutation; use a frontal plane: normal (0, 0, 1) offset 2 after
        # permute becomes (0, -1, 0)... verify depth at principal point for a
        # plane whose permuted normal is +z:
        # permuted = (n0, -n2, n1); choose n = (0, 1, 0) -> permuted (0,0,1)
        planes = np.array([[0.0, 2.0, 0.0]])  # offset 2, normal +y
        d = calc_plane_depths(planes, camera, width=640, height=480)
        assert d.shape == (1, 480, 640)
        np.testing.assert_allclose(d[0, 240, 320], 2.0, atol=1e-3)

    def test_transform_planes_identity(self):
        from tools.generate_scannetv2_data import transform_planes

        planes = np.random.default_rng(1).normal(size=(4, 3)) * 2
        out = transform_planes(np.eye(4), planes)
        np.testing.assert_allclose(out, planes, atol=1e-8)

    def test_transform_planes_translation(self):
        from tools.generate_scannetv2_data import transform_planes

        t = np.eye(4)
        t[:3, 3] = [0, 0, 1.0]
        planes = np.array([[0.0, 0, 2.0]])  # normal +z offset 2
        out = transform_planes(t, planes)
        np.testing.assert_allclose(out, [[0, 0, 3.0]], atol=1e-8)

    def test_relative_pose_identity(self):
        from tools.generate_scannetv2_data import relative_pose_habitat

        e = np.eye(4)
        t, q = relative_pose_habitat(e, e)
        np.testing.assert_allclose(t, [0, 0, 0], atol=1e-9)
        np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-6)

    def test_overlap_ratio(self):
        from tools.generate_scannetv2_data import view_overlap_ratio

        camera = np.array([500.0, 500.0, 320.0, 240.0])
        depth = np.full((480, 640), 2.0)
        same = np.eye(4)
        assert view_overlap_ratio(depth, same, same, camera) > 0.99
        # camera moved far sideways sees little
        far = np.eye(4)
        far[:3, 3] = [50.0, 0, 0]
        assert view_overlap_ratio(depth, same, far, camera) < 0.05

    def test_clean_segmentation_keeps_consistent(self):
        from tools.generate_scannetv2_data import calc_plane_depths, clean_segmentation

        camera = np.array([500.0, 500.0, 320.0, 240.0])
        planes = np.array([[0.0, 2.0, 0.0]])
        pd = calc_plane_depths(planes, camera)[0]
        seg = -np.ones((480, 640), np.int64)
        seg[100:300, 100:400] = 0
        image = np.full((480, 640, 3), 100, np.uint8)
        out = clean_segmentation(image, planes, [99], seg, pd, camera)
        # depth-consistent everywhere -> segment kept
        assert (out[150:250, 150:350] == 0).mean() > 0.95


class TestCameraBranch:
    def test_topk_decode(self):
        from nopesac_tpu.models.camera_branch import CameraBranch

        cb = CameraBranch(dataset="mp3d")
        logits_t = np.zeros(32); logits_t[5] = 10.0
        logits_r = np.zeros(32); logits_r[7] = 10.0
        pred = {"camera": {"logits": {"tran": logits_t, "rot": logits_r},
                           "gts": {"tran": [0, 0, 0], "rot": [1, 0, 0, 0]}}}
        out = cb.get_rel_camera([pred], 0, 0)[0]
        np.testing.assert_allclose(out["position"], cb.class2xyz(5))
        np.testing.assert_allclose(out["rotation"], cb.class2quat(7))
        gt = cb.get_rel_camera([pred], -1, -1)[0]
        np.testing.assert_allclose(gt["position"], [0, 0, 0])


class TestScanNetFullAssembly:
    """End-to-end record assembly on a synthetic raw-scan fixture
    (tools/generate_scannetv2_data.py build_view_record/build_pair_record;
    spec generate_scannetv2_data_final.py:528-936)."""

    def _write_scene(self, root):
        import os
        import pickle  # noqa: F401
        from PIL import Image
        from tools.generate_scannetv2_data import (
            H, W, calc_plane_depths, encode_segmentation_rgb, transform_planes)

        scene = "scene0000_00"
        sp = os.path.join(root, scene)
        for d in ("color", "depth", "pose", "annotation/segmentation"):
            os.makedirs(os.path.join(sp, d), exist_ok=True)

        fx = fy = 320.0
        cam = np.array([fx, fy, W / 2, H / 2])
        with open(os.path.join(sp, scene + ".txt"), "w") as f:
            f.write(f"fx_depth = {fx}\nfy_depth = {fy}\n"
                    f"mx_depth = {W/2}\nmy_depth = {H/2}\n"
                    f"depthWidth = {W}\ndepthHeight = {H}\n"
                    f"numDepthFrames = 40\n")

        def swap(extr):
            e = extr.copy()
            tmp = e[1].copy()
            e[1] = e[2]
            e[2] = -tmp
            return e

        # two camera poses with a sparse-view gap (rot 25 deg, tran 0.6 m)
        th = np.deg2rad(25)
        rot_y = np.array([[np.cos(th), 0, np.sin(th)],
                          [0, 1, 0], [-np.sin(th), 0, np.cos(th)]])
        extr_inv0 = np.eye(4)
        extr_inv1 = np.eye(4)
        extr_inv1[:3, :3] = rot_y
        extr_inv1[:3, 3] = [0.6, 0.1, 0.1]

        # desired camera-frame planes for view 0: 4 near-fronto-parallel
        # planes (small tilts keep depth positive over the full frame in
        # BOTH views); invert the pipeline's transform to get the
        # scene(world)-frame plane fits
        def tilted(nx, ny, d):
            n = np.array([nx, ny, 1.0])
            return n / np.linalg.norm(n) * d

        planes_cam0 = np.stack([
            tilted(0.1, 0.0, 2.0), tilted(-0.1, 0.0, 2.2),
            tilted(0.0, 0.1, 2.4), tilted(0.0, -0.1, 2.6)])
        # calc_plane_depths permutes (x, -z, y): pre-invert that so the
        # rendered depths correspond to the planes above
        inv_perm = np.stack([planes_cam0[:, 0], planes_cam0[:, 2],
                             -planes_cam0[:, 1]], axis=-1)
        s0 = swap(np.linalg.inv(extr_inv0))
        world_planes = transform_planes(np.linalg.inv(s0), inv_perm)

        # explicit quadrant assignment (stable under the view change; the
        # depth png is rendered from the ASSIGNED plane so the pipeline's
        # depth-consistency gate sees zero error)
        qseg = np.zeros((H, W), np.int32)
        qseg[:, W // 2:] = 1
        qseg[H // 2:, : W // 2] = 2
        qseg[H // 2:, W // 2:] = 3

        data = {}
        for idx, extr_inv in ((0, extr_inv0), (20, extr_inv1)):
            with open(os.path.join(sp, "pose", f"{idx}.txt"), "w") as f:
                for row in extr_inv:
                    f.write(" ".join(str(v) for v in row) + "\n")
            pc = transform_planes(swap(np.linalg.inv(extr_inv)), world_planes)
            depths = calc_plane_depths(pc, cam, W, H)  # [4, H, W]
            seg = qseg
            depth = np.take_along_axis(depths, seg[None], 0)[0]
            assert ((depth > 0.3) & (depth < 9.0)).all(), \
                "fixture: assigned-plane depths must stay valid"
            Image.fromarray(encode_segmentation_rgb(seg)).save(
                os.path.join(sp, "annotation", "segmentation", f"{idx}.png"))
            dm = (depth * 1000).astype(np.uint16)
            Image.fromarray(dm).save(os.path.join(sp, "depth", f"{idx}.png"))
            Image.fromarray(np.full((H, W, 3), 200, np.uint8)).save(
                os.path.join(sp, "color", f"{idx}.jpg"))
            data[idx] = seg

        np.save(os.path.join(sp, "annotation", "planes.npy"), world_planes)
        # plane_info entries: [(instance_id, semantic_label)]; label 1=wall
        # (confident) so cleanup keeps segments by area
        info = np.array([[(0, 1)]] * 4, dtype=object)
        np.save(os.path.join(sp, "annotation", "plane_info.npy"), info)
        return sp, scene, data

    def test_full_pipeline_and_mapper_roundtrip(self, tmp_path):
        import os
        from tools.generate_scannetv2_data import generate_scene_pairs

        root = str(tmp_path / "scans")
        out = str(tmp_path / "out")
        sp, scene, _ = self._write_scene(root)
        records = generate_scene_pairs(
            sp, sample_step=20, anns_dir=os.path.join(out, "twoView_Anns"))
        assert len(records) == 1, records
        rec = records[0]
        assert 3 <= len(rec["gt_corrs"]) <= 7
        # both views kept >= 2 planes; rel pose has the fixture gap
        assert rec["0"]["gt_plane_num"] >= 2 and rec["1"]["gt_plane_num"] >= 2
        assert abs(np.linalg.norm(rec["rel_pose"]["position"]) - 0.62) < 0.05
        ang = 2 * np.degrees(np.arccos(abs(rec["rel_pose"]["rotation"][0])))
        assert abs(ang - 25) < 2.0
        # twoView_Anns pickles written
        assert os.path.exists(os.path.join(out, "twoView_Anns", scene, "0.pkl"))

        # the data mapper consumes the record end-to-end
        from nopesac_tpu.data.mapper import PairMapper

        mapper = PairMapper(is_train=True, dataset_kind="scannet",
                            root_dir=out, image_size=(480, 640))
        sample = mapper(rec)
        from nopesac_tpu.data.packing import unpack_targets_np

        t0 = unpack_targets_np(sample["targets0"])
        n = int(t0["gt_valid"].sum())
        assert n == rec["0"]["gt_plane_num"]
        assert t0["gt_masks"][:n].sum() > 0
        assert np.isfinite(t0["gt_params"][:n]).all()
        assert sample["corr_valid"].sum() == len(rec["gt_corrs"])
        # depth png round-trips through the mapper
        assert float(t0["depth"].max()) > 0.3
