"""Front-end kernel tests cross-validated against OpenCV (SURVEY.md §4:
'unit-test each kernel against a slow reference')."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_tpu.frontend import fast as fast_mod
from orb_slam3_tpu.frontend import orb as orb_mod
from orb_slam3_tpu.frontend import pyramid as pyr_mod


def synth_image(seed=0, h=240, w=320, n_blobs=120):
    """Random blobby grayscale image with corner-rich structure."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    for _ in range(n_blobs):
        x, y = rng.integers(10, w - 10), rng.integers(10, h - 10)
        sz = rng.integers(3, 12)
        img[y : y + sz, x : x + sz] = rng.uniform(50, 255)
    img = cv2.GaussianBlur(img, (3, 3), 0.8)
    return img.astype(np.float32)


class TestFAST:
    def test_matches_opencv_detections(self):
        img = synth_image()
        th = 20
        resp = np.array(fast_mod.fast_response(jnp.asarray(img), float(th)))
        kps = cv2.FastFeatureDetector_create(
            threshold=th, nonmaxSuppression=False
        ).detect(img.astype(np.uint8))
        cv_mask = np.zeros_like(resp, bool)
        for k in kps:
            cv_mask[int(k.pt[1]), int(k.pt[0])] = True
        ours = resp > 0
        # interior comparison (borders handled differently)
        sl = np.s_[4:-4, 4:-4]
        agree = (ours[sl] == cv_mask[sl]).mean()
        assert agree > 0.995, agree
        # recall of cv corners specifically
        cv_n = cv_mask[sl].sum()
        hit = (ours[sl] & cv_mask[sl]).sum()
        assert cv_n > 100
        assert hit / cv_n > 0.97

    def test_nms_keeps_local_maxima(self):
        img = synth_image(1)
        resp = fast_mod.detect(jnp.asarray(img), 20.0, 7.0)
        r = np.array(resp)
        ys, xs = np.nonzero(r)
        for y, x in zip(ys[:50], xs[:50]):
            window = r[max(0, y - 1) : y + 2, max(0, x - 1) : x + 2]
            assert r[y, x] == window.max()


class TestORB:
    def test_descriptors_match_opencv(self):
        """Compute descriptors at OpenCV's own keypoints; Hamming distance to
        cv2's descriptors must be near 0 for the vast majority."""
        img = synth_image(2)
        orb = cv2.ORB_create(nfeatures=300)
        kps = orb.detect(img.astype(np.uint8), None)
        kps, cv_desc = orb.compute(img.astype(np.uint8), kps)
        # restrict to level-0 keypoints away from borders
        sel = [
            i
            for i, k in enumerate(kps)
            if k.octave == 0
            and 25 < k.pt[0] < img.shape[1] - 25
            and 25 < k.pt[1] < img.shape[0] - 25
        ]
        assert len(sel) > 30
        xy = jnp.asarray(
            np.array([[kps[i].pt[0], kps[i].pt[1]] for i in sel], np.int32)
        )
        jimg = jnp.asarray(img)
        raw_patches = orb_mod.gather_patches(jimg, xy)
        angles = orb_mod.ic_angle(raw_patches)
        # angles must match cv2's (degrees)
        cv_angles = np.array([kps[i].angle for i in sel])
        our_deg = np.degrees(np.array(angles)) % 360
        dang = np.abs((our_deg - cv_angles + 180) % 360 - 180)
        assert np.median(dang) < 2.0, np.median(dang)

        blurred = pyr_mod.gaussian_blur(jimg)
        blur_patches = orb_mod.gather_patches(blurred, xy)
        desc = np.array(orb_mod.brief_descriptors(blur_patches, angles))
        cv_d = np.array([cv_desc[i] for i in sel], np.uint8)
        ham = np.unpackbits(desc ^ cv_d, axis=1).sum(axis=1)
        # allow small deviations from blur/rounding differences
        assert np.median(ham) <= 8, (np.median(ham), ham[:20])

    def test_full_extract_shapes_and_spread(self):
        img = synth_image(3)
        cfg = orb_mod.OrbConfig(n_features=500, n_levels=4)
        feats = orb_mod.extract(jnp.asarray(img), cfg)
        assert feats.xy.shape == (500, 2)
        assert feats.descriptors.shape == (500, 32)
        n_valid = int(feats.valid.sum())
        assert n_valid > 200
        v = np.array(feats.valid)
        xy = np.array(feats.xy)[v]
        # spatial spread: keypoints cover at least half the image quadrants
        h, w = img.shape
        qx = (xy[:, 0] > w / 2).astype(int) + 2 * (xy[:, 1] > h / 2).astype(int)
        assert len(np.unique(qx)) == 4
        # octaves populated
        assert len(np.unique(np.array(feats.octave)[v])) >= 3

    def test_extract_jits(self):
        img = synth_image(4)
        cfg = orb_mod.OrbConfig(n_features=300, n_levels=3)
        f = jax.jit(lambda im: orb_mod.extract(im, cfg))
        feats = f(jnp.asarray(img))
        feats2 = f(jnp.asarray(synth_image(5)))
        assert int(feats2.valid.sum()) > 100


class TestSubpixelRefinement:
    def test_recovers_fractional_corner(self):
        """refine_corners_flat must recover a known subpixel corner position
        of a smooth (band-limited) quadrant corner."""
        import scipy.ndimage as ndi

        for ox, oy in [(0.3, -0.2), (-0.4, 0.1), (0.0, 0.45)]:
            # bright quadrant with corner at (40 + ox, 40 + oy), rendered
            # with 8x pixel-center-aligned supersampling then blurred
            # (optics stand-in): pixel i averages [i-0.5, i+0.5)
            ss = 8
            H = 80 * ss
            coords = (np.arange(H) + 0.5) / ss - 0.5
            xx = coords[None, :]
            yy = coords[:, None]
            # saddle (checkerboard) corner — the estimator's canonical
            # target: gradient structure is symmetric, so the corner is the
            # unbiased stationary point (L-shaped corners carry an inherent
            # inward bias for any gradient-orthogonality method)
            img_ss = (
                (xx > 40 + ox) ^ (yy > 40 + oy)
            ).astype(np.float32) * 200
            img = img_ss.reshape(80, ss, 80, ss).mean(axis=(1, 3))
            img = ndi.gaussian_filter(img, 1.0)

            xy = jnp.asarray([[40, 40]], jnp.int32)
            patch = orb_mod.gather_patches_flat(jnp.asarray(img), xy)
            off = np.array(orb_mod.refine_corners_flat(patch))[0]
            assert abs(off[0] - ox) < 0.15, (ox, oy, off)
            assert abs(off[1] - oy) < 0.15, (ox, oy, off)
