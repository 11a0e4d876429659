import os

import numpy as np
import pytest

from nopesac_tpu.utils import rle as rle_util
from nopesac_tpu.utils.mesh import (
    backproject_plane_points, camera_frustum_mesh, join_meshes,
    plane_to_mesh, save_obj, save_ply, transform_mesh,
)
from nopesac_tpu.utils.np_geometry import plane_params_to_global
from nopesac_tpu.visualization.vis2d import create_instances, draw_match, get_labeled_seg


def default_kmap(h, w):
    from nopesac_tpu.core.geometry import get_coordinate_map

    return np.asarray(get_coordinate_map(h=h, w=w))


class TestBackprojection:
    def test_points_lie_on_plane(self):
        h, w = 48, 64
        kmap = default_kmap(h, w)
        plane = np.array([0.0, 0.0, 2.0])  # suncg param: normal +z, offset 2
        mask = np.zeros((h, w), bool)
        mask[20:30, 25:40] = True
        pts, ys, xs = backproject_plane_points(mask, plane, kmap)
        # habitat frame: flipped normal is (0, 0, -1), offset 2 -> n.X = 2
        flipped = plane * np.array([1, -1, -1])
        n = flipped / np.linalg.norm(flipped)
        d = np.linalg.norm(flipped)
        np.testing.assert_allclose(pts @ n, np.full(len(pts), d), atol=1e-5)

    def test_mesh_faces_valid(self):
        h, w = 48, 64
        kmap = default_kmap(h, w)
        mask = np.zeros((h, w), bool)
        mask[10:40, 10:50] = True
        m = plane_to_mesh(mask, np.array([0.5, 0.5, 1.0]), kmap, step=2)
        assert m is not None
        assert m["faces"].max() < len(m["verts"])
        assert len(m["faces"]) > 10

    def test_transform_roundtrip(self):
        mesh = {"verts": np.random.default_rng(0).normal(size=(10, 3)),
                "faces": np.zeros((0, 3), np.int64), "vert_colors": None}
        q = np.array([0.9, 0.1, 0.3, 0.2])
        q = q / np.linalg.norm(q)
        t = np.array([1.0, -2.0, 0.5])
        out = transform_mesh(mesh, t, q)
        # invert
        from nopesac_tpu.utils.np_geometry import quat_conjugate, quat_to_rotmat

        r_inv = quat_to_rotmat(quat_conjugate(q))
        back = (out["verts"] - t) @ r_inv.T
        np.testing.assert_allclose(back, mesh["verts"], atol=1e-10)


class TestWriters:
    def test_obj_and_ply(self, tmp_path):
        mesh = {
            "verts": np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float),
            "faces": np.array([[0, 1, 2]]),
            "vert_colors": np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], float),
        }
        p = save_obj(str(tmp_path), "tri", mesh)
        content = open(p).read()
        assert content.count("\nv ") + content.startswith("v ") == 3
        assert "f 1 2 3" in content
        p2 = save_ply(str(tmp_path / "tri.ply"), mesh)
        ply = open(p2).read()
        assert "element vertex 3" in ply and "element face 1" in ply

    def test_join_and_frustum(self, tmp_path):
        f1 = camera_frustum_mesh([0, 0, 0], [1, 0, 0, 0])
        f2 = camera_frustum_mesh([1, 0, 0], [1, 0, 0, 0])
        joined = join_meshes([f1, f2])
        assert len(joined["verts"]) == 10
        assert joined["faces"].max() == 9


class TestVis2D:
    def test_labeled_seg_and_match(self, tmp_path):
        h, w = 60, 80
        img = np.full((h, w, 3), 128, np.uint8)
        m0 = np.zeros((h, w), np.uint8); m0[5:25, 5:30] = 1
        m1 = np.zeros((h, w), np.uint8); m1[30:50, 40:70] = 1
        seg = get_labeled_seg(img, [m0, m1])
        assert seg.shape == (h, w, 3)
        assert not np.array_equal(seg, img)

        out = draw_match(img, img, [m0, m1], [m1, m0], np.array([[0, 1], [1, 0]]))
        assert out.shape == (h, 2 * w, 3)

    def test_affinity_stitched(self, tmp_path):
        from nopesac_tpu.visualization.vis2d import save_affinity_stitched

        rng = np.random.default_rng(0)
        aff = rng.uniform(size=(7, 4)).astype(np.float32)
        matching = np.array([1, -1, 0, 3, -1, 2, -1])
        path = str(tmp_path / "aff.png")
        save_affinity_stitched(aff, 7, 4, matching, path)
        assert os.path.exists(path) and os.path.getsize(path) > 1000

    def test_create_instances_filters(self):
        preds = [
            {"score": 0.9, "category_id": 0, "segmentation": {"size": [4, 4], "counts": b"04"}},
            {"score": 0.05, "category_id": 0, "segmentation": {"size": [4, 4], "counts": b"04"}},
        ]
        inst = create_instances(preds, (4, 4), pred_planes=np.eye(2, 3), conf_threshold=0.1)
        assert len(inst["scores"]) == 1
        assert inst["pred_planes"].shape == (1, 3)


class TestTexturedExport:
    def test_textured_obj_mtl(self, tmp_path):
        """Textured OBJ+MTL export: rectified texture, per-vertex UVs, files
        on disk (utils/vis.py:103-243, mesh_utils.py:132-271)."""
        from nopesac_tpu.utils.mesh import planes_to_textured_meshes, save_obj_textured

        h, w = 48, 64
        kmap = default_kmap(h, w)
        rng = np.random.default_rng(0)
        image = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        masks = np.zeros((2, h, w), np.uint8)
        masks[0, 8:24, 8:30] = 1
        masks[1, 30:44, 34:60] = 1
        planes = np.array([[0.0, 0.0, 2.0], [0.3, -0.2, 1.8]])

        meshes = planes_to_textured_meshes(masks, planes, kmap, image, step=2)
        assert len(meshes) == 2
        for m in meshes:
            assert m["texture"].shape == (300, 300, 3)
            assert m["uvs"].shape == (len(m["verts"]), 2)
            assert (m["uvs"] >= -1e-6).all() and (m["uvs"] <= 1 + 1e-6).all()
            # texture is non-trivial (the warp actually sampled the image)
            assert m["texture"].std() > 1.0

        path = save_obj_textured(str(tmp_path), "pair0", meshes)
        assert os.path.exists(path)
        assert os.path.exists(str(tmp_path / "pair0.mtl"))
        assert os.path.exists(str(tmp_path / "pair0_tex0.png"))
        assert os.path.exists(str(tmp_path / "pair0_tex1.png"))
        obj_txt = open(path).read()
        assert "mtllib pair0.mtl" in obj_txt
        assert "usemtl pair0_plane1" in obj_txt
        assert "vt " in obj_txt and "/" in obj_txt.split("\nf ")[1]
        mtl_txt = open(str(tmp_path / "pair0.mtl")).read()
        assert "map_Kd pair0_tex0.png" in mtl_txt

    def test_frontoparallel_texture_matches_image(self, tmp_path):
        """For a fronto-parallel plane the rectifying homography is an
        axis-aligned scale: the texture must reproduce the masked image
        patch (up to resampling)."""
        import cv2

        from nopesac_tpu.utils.mesh import plane_to_mesh, plane_texture_and_uvs

        h, w = 48, 64
        kmap = default_kmap(h, w)
        image = np.zeros((h, w, 3), np.uint8)
        image[:, :, 0] = (np.arange(w)[None, :] * 4).astype(np.uint8)  # x ramp
        mask = np.zeros((h, w), bool)
        mask[10:30, 10:40] = True
        plane = np.array([0.0, 0.0, 2.0])
        m = plane_to_mesh(mask, plane, kmap, image, step=1)
        tex, uvs = plane_texture_and_uvs(m, image, plane)
        # the image x-ramp must survive as a clean monotone ramp along
        # exactly one texture axis (the in-plane basis may map x to u or v)
        row = tex[150, 20:280, 0].astype(int)
        col = tex[20:280, 150, 0].astype(int)

        def monotone(a):
            d = np.diff(a)
            return (a[-1] != a[0]) and ((d >= 0).all() or (d <= 0).all())

        def constant(a):
            return int(a.max()) - int(a.min()) <= 1

        assert (monotone(row) and constant(col)) or (monotone(col) and constant(row))
