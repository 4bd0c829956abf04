"""Box encode→decode round trips: raw params built from GT must decode back
to the GT boxes exactly (pins the channel layout + bin/template math)."""

import jax.numpy as jnp
import numpy as np

from tpu3dsad.data.synthetic import class_mean_sizes
from tpu3dsad.models.decode import decode_proposals, predicted_boxes
from tpu3dsad.ops.boxes import angle_from_bin, angle_to_bin

NH, NC = 12, 4
MS = class_mean_sizes(NC)


def test_angle_bin_roundtrip():
    angles = np.linspace(-np.pi + 1e-4, np.pi - 1e-4, 101).astype(np.float32)
    b, r = angle_to_bin(jnp.asarray(angles), NH)
    back = np.asarray(angle_from_bin(b, r, NH))
    # compare on the circle
    diff = np.abs(np.mod(back - angles + np.pi, 2 * np.pi) - np.pi)
    np.testing.assert_allclose(diff, 0, atol=1e-5)
    assert (np.asarray(b) >= 0).all() and (np.asarray(b) < NH).all()
    assert (np.abs(np.asarray(r)) <= np.pi / NH + 1e-5).all()


def test_decode_roundtrip_from_gt(rng):
    B, P = 2, 16
    centers = rng.uniform(-3, 3, (B, P, 3)).astype(np.float32)
    classes = rng.integers(0, NC, (B, P))
    sizes = (MS[classes] * rng.uniform(0.7, 1.4, (B, P, 3))).astype(np.float32)
    headings = rng.uniform(-np.pi, np.pi, (B, P)).astype(np.float32)

    hbin, hres = angle_to_bin(jnp.asarray(headings), NH)
    hbin, hres = np.asarray(hbin), np.asarray(hres)

    # build raw params channel-exactly as decode_proposals expects
    raw = np.zeros((B, P, 2 + 3 + NH * 2 + NC * 4 + NC), np.float32)
    base_xyz = rng.uniform(-3, 3, (B, P, 3)).astype(np.float32)
    raw[..., 2:5] = centers - base_xyz
    for b in range(B):
        for p in range(P):
            raw[b, p, 5 + hbin[b, p]] = 10.0  # heading bin logit
            raw[b, p, 5 + NH + hbin[b, p]] = hres[b, p] / (np.pi / NH)
            c = classes[b, p]
            raw[b, p, 5 + 2 * NH + c] = 10.0  # size template logit
            off = 5 + 2 * NH + NC + c * 3
            raw[b, p, off : off + 3] = (sizes[b, p] - MS[c]) / MS[c]
            raw[b, p, 5 + 2 * NH + 4 * NC + c] = 10.0  # sem logit

    ep = decode_proposals(jnp.asarray(raw), jnp.asarray(base_xyz), MS, NH)
    center, size, heading, sem, obj = predicted_boxes(ep, MS, NH)

    np.testing.assert_allclose(np.asarray(center), centers, atol=1e-5)
    np.testing.assert_allclose(np.asarray(size), sizes, atol=1e-4)
    hdiff = np.abs(
        np.mod(np.asarray(heading) - headings + np.pi, 2 * np.pi) - np.pi
    )
    np.testing.assert_allclose(hdiff, 0, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(sem), classes)
