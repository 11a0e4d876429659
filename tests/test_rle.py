import numpy as np
import pytest

from nopesac_tpu.utils import rle


def random_mask(rng, h, w, blobs=3):
    m = np.zeros((h, w), np.uint8)
    for _ in range(blobs):
        y, x = rng.integers(0, h), rng.integers(0, w)
        hh, ww = rng.integers(1, h // 2 + 1), rng.integers(1, w // 2 + 1)
        m[y:y + hh, x:x + ww] = 1
    return m


class TestRoundtrip:
    @pytest.mark.parametrize("seed", range(8))
    def test_encode_decode(self, seed):
        rng = np.random.default_rng(seed)
        h, w = int(rng.integers(2, 97)), int(rng.integers(2, 97))
        m = random_mask(rng, h, w)
        r = rle.encode(m)
        assert isinstance(r["counts"], bytes)
        out = rle.decode(r)
        np.testing.assert_array_equal(out, m)

    def test_empty_and_full(self):
        for m in [np.zeros((7, 5), np.uint8), np.ones((7, 5), np.uint8)]:
            np.testing.assert_array_equal(rle.decode(rle.encode(m)), m)

    def test_uncompressed_counts_list(self):
        # {"counts": [list], "size": ...} decode path (as stored in datasets)
        m = np.zeros((4, 3), np.uint8)
        m[1:3, 1] = 1
        r = rle.encode(m)
        runs = rle._to_runs(r)
        out = rle.decode({"size": [4, 3], "counts": list(runs)})
        np.testing.assert_array_equal(out, m)

    def test_known_string_format(self):
        # single-pixel mask at (0,0) of 1x1 -> runs [0, 1]
        m = np.ones((1, 1), np.uint8)
        r = rle.encode(m)
        assert rle.area(r) == 1
        np.testing.assert_array_equal(rle.decode(r), m)


class TestGeometry:
    def test_area(self):
        rng = np.random.default_rng(3)
        m = random_mask(rng, 31, 45)
        assert rle.area(rle.encode(m)) == int(m.sum())

    def test_bbox(self):
        m = np.zeros((20, 30), np.uint8)
        m[5:11, 7:19] = 1
        bbox = rle.to_bbox(rle.encode(m))
        np.testing.assert_array_equal(bbox, [7, 5, 12, 6])

    def test_bbox_empty(self):
        np.testing.assert_array_equal(rle.to_bbox(rle.encode(np.zeros((4, 4), np.uint8))), [0, 0, 0, 0])

    def test_iou(self):
        rng = np.random.default_rng(4)
        ms1 = [random_mask(rng, 24, 24) for _ in range(3)]
        ms2 = [random_mask(rng, 24, 24) for _ in range(2)]
        got = rle.iou([rle.encode(m) for m in ms1], [rle.encode(m) for m in ms2])
        for i, a in enumerate(ms1):
            for j, b in enumerate(ms2):
                inter = np.logical_and(a, b).sum()
                union = np.logical_or(a, b).sum()
                expect = inter / union if union else 0.0
                np.testing.assert_allclose(got[i, j], expect, atol=1e-9)

    def test_iou_crowd(self):
        a = np.zeros((10, 10), np.uint8); a[:5] = 1
        b = np.ones((10, 10), np.uint8)
        got = rle.iou([rle.encode(a)], [rle.encode(b)], iscrowd=[1])
        np.testing.assert_allclose(got[0, 0], 1.0)  # inter/area(dt)

    def test_merge(self):
        a = np.zeros((8, 8), np.uint8); a[:4] = 1
        b = np.zeros((8, 8), np.uint8); b[2:6] = 1
        u = rle.decode(rle.merge([rle.encode(a), rle.encode(b)]))
        np.testing.assert_array_equal(u, (a | b))
        i = rle.decode(rle.merge([rle.encode(a), rle.encode(b)], intersect=True))
        np.testing.assert_array_equal(i, (a & b))


class TestNativeParity:
    def test_native_matches_python(self):
        """C++ codec must be byte-identical to the pure-python reference."""
        if not rle._HAVE_NATIVE:
            pytest.skip("native codec not built")
        rng = np.random.default_rng(11)
        for _ in range(5):
            m = random_mask(rng, 37, 53)
            r_nat = rle.encode(m)
            # force python path
            flat = m.T.reshape(-1).astype(bool)
            change = np.nonzero(np.diff(flat))[0] + 1
            bounds = np.concatenate([[0], change, [flat.size]])
            runs = np.diff(bounds)
            if flat[0]:
                runs = np.concatenate([[0], runs])
            r_py = rle._counts_to_string(runs)
            assert r_nat["counts"] == r_py
            # python decode of the native string
            np.testing.assert_array_equal(
                rle.decode({"size": [37, 53], "counts": r_nat["counts"]}), m)

    def test_native_iou_matches_python(self):
        if not rle._HAVE_NATIVE:
            pytest.skip("native codec not built")
        rng = np.random.default_rng(12)
        ms1 = [random_mask(rng, 24, 24) for _ in range(3)]
        ms2 = [random_mask(rng, 24, 24) for _ in range(3)]
        d = [rle.encode(m) for m in ms1]
        g = [rle.encode(m) for m in ms2]
        nat = rle._native_iou(d, g, None)
        # python reference
        out = np.zeros((3, 3))
        for i, a in enumerate(ms1):
            for j, b in enumerate(ms2):
                inter = np.logical_and(a, b).sum()
                union = np.logical_or(a, b).sum()
                out[i, j] = inter / union if union else 0.0
        np.testing.assert_allclose(nat, out, atol=1e-12)


class TestPolygon:
    def test_rect_polygon(self):
        # rectangle polygon -> filled mask
        poly = [[2, 3, 10, 3, 10, 8, 2, 8]]
        m = rle.poly_to_mask(poly, 12, 14)
        assert m[5, 6] == 1 and m[0, 0] == 0
        assert m[3, 2] == 1  # boundary included


class TestNativeRobustness:
    """Regressions for native-codec bugs found by review (confirmed by
    execution): list-form counts through iou, malformed counts through
    decode (previously a SIGSEGV), float-mask encode thresholding. All
    assertions also hold for the pure-python path when the lib is absent."""

    def test_iou_accepts_uncompressed_list_counts(self):
        m = np.zeros((8, 8), np.uint8)
        m[3:6, 3:6] = 1
        r = rle.encode(m)
        runs = [int(x) for x in rle._to_runs(r)]
        r_list = {"size": [8, 8], "counts": runs}
        got = rle.iou([r], [r_list], [0])
        np.testing.assert_allclose(got, [[1.0]])

    def test_decode_malformed_counts_no_crash(self):
        # negative-run encoding + trailing continuation bit: must not
        # segfault / read out of bounds; any all-zero-ish mask is fine
        out = rle.decode({"size": [8, 8], "counts": b"5M:"})
        assert out.shape == (8, 8)
        out2 = rle.decode({"size": [8, 8], "counts": b"5M\x7f"})
        assert out2.shape == (8, 8)

    def test_encode_float_mask_thresholds(self):
        m = np.full((4, 4), 0.5, np.float32)
        r = rle.encode(m)
        assert rle.area(r) == 16  # nonzero == foreground, any dtype

    def test_merge_empty(self):
        r = rle.merge([])
        assert r["size"] == [0, 0] and r["counts"] == b""

    def test_iou_size_mismatch_raises_or_matches_python(self):
        a = rle.encode(np.ones((8, 8), np.uint8))
        b = rle.encode(np.ones((4, 4), np.uint8))
        if rle._HAVE_NATIVE:
            with np.testing.assert_raises(ValueError):
                rle.iou([a], [b], [0])


def test_string_to_counts_vectorized_matches_loop():
    """The vectorised LEB parser agrees with a straight per-byte reader on
    random masks (incl. large counts needing multi-group encodings)."""
    def loop_parse(s):
        counts = []
        i, n = 0, len(s)
        while i < n:
            x, k, more = 0, 0, True
            while more:
                c = s[i] - 48
                x |= (c & 0x1F) << (5 * k)
                more = bool(c & 0x20)
                i += 1
                if not more and (c & 0x10):
                    x |= -1 << (5 * k + 5)
                k += 1
            if len(counts) > 2:
                x += counts[len(counts) - 2]
            counts.append(x)
        return np.asarray(counts, np.int64)

    rng = np.random.default_rng(0)
    for trial in range(8):
        m = (rng.uniform(size=(120, 160)) < rng.uniform(0.02, 0.9)).astype(np.uint8)
        s = rle.encode(m)["counts"]
        np.testing.assert_array_equal(rle._string_to_counts(s), loop_parse(s))
    # degenerate: huge single run (multi-group encoding)
    s = rle._counts_to_string(np.asarray([10**7, 5, 10**7]))
    np.testing.assert_array_equal(rle._string_to_counts(s), loop_parse(s))


class TestEncodeLabelMap:
    def test_parity_with_per_mask_encode(self):
        """encode_label_map must be byte-identical to encoding each query's
        boolean mask separately (the round-5 postprocess fast path)."""
        from nopesac_tpu.utils import rle as rle_util

        rng = np.random.default_rng(7)
        for _ in range(10):
            h, w = int(rng.integers(3, 60)), int(rng.integers(3, 60))
            nq = int(rng.integers(1, 6))
            labels = rng.integers(-1, nq, size=(h, w)).astype(np.int32)
            qids = list(range(nq)) + [123]  # 123 never present -> empty
            out = rle_util.encode_label_map(labels, qids)
            for q, r in zip(qids, out):
                ref = rle_util.encode((labels == q).astype(np.uint8))
                assert r["counts"] == ref["counts"]
                assert r["size"] == ref["size"]

    def test_edges(self):
        from nopesac_tpu.utils import rle as rle_util

        all_on = np.zeros((5, 7), np.int32)
        all_off = np.full((5, 7), -1, np.int32)
        for labels in (all_on, all_off):
            r = rle_util.encode_label_map(labels, [0])[0]
            ref = rle_util.encode((labels == 0).astype(np.uint8))
            assert r["counts"] == ref["counts"]

    def test_counts_to_string_matches_python(self):
        from nopesac_tpu.utils import rle as rle_util

        runs = np.asarray([0, 1, 307199], np.int64)
        assert rle_util.counts_to_string(runs) == rle_util._counts_to_string(runs)
