"""Golden regression anchors: the 7x20 DiffusionField grid's f/g outputs
frozen at round 1 (threefry PRNG, fixed seeds). Protects the vector-field
semantics across future refactors — the cross-implementation analogue of
the reference's cross-tree f/g parity contract (SURVEY.md §4)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "field_grid_v1.npz")


def test_field_grid_matches_goldens():
    from snsde.fields import DiffusionField
    from snsde.ops.interp import CubicPath, hermite_cubic_coeffs

    data = np.load(GOLDEN)
    x, y, times = data["x"], data["y"], data["times"]
    B, L, C = x.shape
    H = y.shape[-1]
    coeffs = hermite_cubic_coeffs(jnp.asarray(times), jnp.asarray(x))
    path = CubicPath(coeffs, times)
    key = jax.random.PRNGKey(0)
    # golden init keys used the threefry impl
    with jax.default_prng_impl("threefry2x32"):
        key = jax.random.PRNGKey(0)
        idx = 0
        for io in range(7):
            for no in range(20):
                field = DiffusionField.create(
                    jax.random.fold_in(key, io * 20 + no), C, H, H, 2,
                    input_option=io, noise_option=no,
                ).bind(path)
                fv = np.asarray(field.f(jnp.asarray(0.3), jnp.asarray(y)))
                gv = np.asarray(field.g(jnp.asarray(0.3), jnp.asarray(y)))
                np.testing.assert_allclose(
                    fv, data["f"][idx], atol=1e-5,
                    err_msg=f"f mismatch at grid cell ({io},{no})",
                )
                np.testing.assert_allclose(
                    gv, data["g"][idx], atol=1e-5,
                    err_msg=f"g mismatch at grid cell ({io},{no})",
                )
                idx += 1


def test_mfcc_matches_torch_reconstructed_torchaudio():
    """The numpy MFCC pipeline must match the torch-reconstructed
    torchaudio default pipeline (VERDICT r2 item 6): periodic Hann +
    center/reflect torch.stft, htk mel scale with norm=None triangles,
    natural log with 1e-6 floor, ortho DCT-II. Goldens frozen by
    tools/make_mfcc_goldens.py from torch.stft (float64) for four
    deterministic waveforms. Match:
    /root/reference/benchmark_classification/datasets/speech_commands.py:54-55.
    """
    from snsde.data.speech_commands import mfcc

    path = os.path.join(os.path.dirname(__file__), "goldens", "mfcc.npz")
    data = np.load(path)
    for name in ["harmonic", "noise", "chirp", "click"]:
        ours = mfcc(data[f"wave_{name}"])
        ref = data[f"mfcc_{name}"]
        assert ours.shape == ref.shape == (161, 20)
        np.testing.assert_allclose(ours, ref, atol=1e-3,
                                   err_msg=f"MFCC mismatch on {name}")
