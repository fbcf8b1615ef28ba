"""Loss/metric oracle tests: PIT vs brute-force permutations, SNR vs numpy
(SURVEY.md §4 implication: unit tests with numpy oracles)."""
import itertools

import jax.numpy as jnp
import numpy as np

from danet_tpu.ops import loss as L


def _brute_force_pit(x, y):
    """Oracle: min over permutations of sum_i mean|x_i - y_p(i)|^2,
    then mean over batch (complex numpy arrays [B, N, ...])."""
    b, n = x.shape[:2]
    losses = np.zeros(b)
    best_perm = np.zeros((b, n), dtype=int)
    for bi in range(b):
        best = np.inf
        for perm in itertools.permutations(range(n)):
            tot = sum(
                np.mean(np.abs(x[bi, i] - y[bi, perm[i]]) ** 2)
                for i in range(n))
            if tot < best:
                best = tot
                best_perm[bi] = perm
        losses[bi] = best
    return losses.mean(), best_perm


def test_pit_matches_brute_force_real():
    rng = np.random.RandomState(0)
    x = rng.randn(5, 3, 7, 4).astype(np.float32)
    y = rng.randn(5, 3, 7, 4).astype(np.float32)
    loss, perms, idx = L.pit_mse_loss(jnp.asarray(x), jnp.asarray(y))
    ref, ref_perm = _brute_force_pit(x, y)
    np.testing.assert_allclose(float(loss), ref, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(perms)[np.asarray(idx)],
                                  ref_perm)


def test_pit_complex_ri_matches_complex():
    rng = np.random.RandomState(1)
    xc = (rng.randn(4, 2, 6, 5) + 1j * rng.randn(4, 2, 6, 5)).astype(
        np.complex64)
    yc = (rng.randn(4, 2, 6, 5) + 1j * rng.randn(4, 2, 6, 5)).astype(
        np.complex64)
    x_ri = np.stack([xc.real, xc.imag], -1)
    y_ri = np.stack([yc.real, yc.imag], -1)
    loss_ri, _, idx_ri = L.pit_mse_loss(
        jnp.asarray(x_ri), jnp.asarray(y_ri), complex_ri=True)
    ref, ref_perm = _brute_force_pit(xc, yc)
    np.testing.assert_allclose(float(loss_ri), ref, rtol=1e-5)


def test_pit_gemm_matches_dense_and_grads():
    """The Gram/GEMM cost-matrix path (default; no [B,N,N,...] tensor)
    must match the literal dense formulation in loss, permutation choice,
    AND gradient."""
    import jax

    rng = np.random.RandomState(7)
    x = rng.randn(6, 3, 11, 5, 2).astype(np.float32)
    y = rng.randn(6, 3, 11, 5, 2).astype(np.float32)

    def run(method):
        def f(yy):
            loss, _, idx = L.pit_mse_loss(
                jnp.asarray(x), yy, complex_ri=True, method=method)
            return loss, idx
        (loss, idx), grad = jax.value_and_grad(f, has_aux=True)(
            jnp.asarray(y))
        return float(loss), np.asarray(idx), np.asarray(grad)

    lg, ig, gg = run("gemm")
    ld, idn, gd = run("dense")
    np.testing.assert_array_equal(ig, idn)
    np.testing.assert_allclose(lg, ld, rtol=1e-5)
    np.testing.assert_allclose(gg, gd, rtol=1e-4, atol=1e-6)


def test_unpermute_restores_order():
    rng = np.random.RandomState(2)
    x = rng.randn(4, 3, 8).astype(np.float32)
    # y = x with sources shuffled per batch elem; PIT must recover x's order
    y = np.empty_like(x)
    true_perm = np.stack([np.random.permutation(3) for _ in range(4)])
    for b in range(4):
        for i in range(3):
            y[b, i] = x[b, true_perm[b, i]]
    loss, perms, idx = L.pit_mse_loss(jnp.asarray(x), jnp.asarray(y))
    assert float(loss) < 1e-10
    y_fixed = np.asarray(L.unpermute(jnp.asarray(y), perms, idx))
    np.testing.assert_allclose(y_fixed, x, atol=1e-6)


def test_batch_snr_oracle():
    rng = np.random.RandomState(3)
    clear = rng.randn(6, 2, 10, 4).astype(np.float32)
    noisy = clear + 0.1 * rng.randn(6, 2, 10, 4).astype(np.float32)
    out = np.asarray(L.batch_snr(jnp.asarray(clear), jnp.asarray(noisy)))
    eps = 1e-7
    ref = 4.342944819 * (
        np.log(np.mean(clear ** 2, axis=(1, 2, 3)) + eps)
        - np.log(np.mean((clear - noisy) ** 2, axis=(1, 2, 3)) + eps))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_batch_snr_ri_matches_complex():
    rng = np.random.RandomState(4)
    c = (rng.randn(3, 5, 4) + 1j * rng.randn(3, 5, 4)).astype(np.complex64)
    n = c + 0.3 * (rng.randn(3, 5, 4)
                   + 1j * rng.randn(3, 5, 4)).astype(np.complex64)
    ri = np.asarray(L.batch_snr(
        jnp.asarray(np.stack([c.real, c.imag], -1)),
        jnp.asarray(np.stack([n.real, n.imag], -1)), complex_ri=True))
    # numpy complex oracle (reference ops.py:208-210: abs of signal & noise)
    eps = 1e-7
    ref = 4.342944819 * (
        np.log(np.mean(np.abs(c) ** 2, axis=(1, 2)) + eps)
        - np.log(np.mean(np.abs(c - n) ** 2, axis=(1, 2)) + eps))
    np.testing.assert_allclose(ri, ref, rtol=1e-4)


def test_si_snr_perfect_and_scaled():
    rng = np.random.RandomState(5)
    t = rng.randn(3, 1000).astype(np.float32)
    # scale invariance: si_snr(t, 0.5*t) should be very high
    out = np.asarray(L.si_snr(jnp.asarray(t), jnp.asarray(0.5 * t)))
    assert (out > 40).all()
    noisy = t + 0.1 * rng.randn(3, 1000).astype(np.float32)
    out2 = np.asarray(L.si_snr(jnp.asarray(t), jnp.asarray(noisy)))
    assert ((out2 > 15) & (out2 < 25)).all()


def test_combinations_gather():
    data = jnp.arange(10).reshape(5, 2).astype(jnp.float32)
    out = np.asarray(L.combinations_gather(data, 2))
    combs = list(itertools.combinations(range(5), 2))
    assert out.shape == (len(combs), 2, 2)
    for i, (a, b) in enumerate(combs):
        np.testing.assert_array_equal(out[i, 0], np.asarray(data[a]))
        np.testing.assert_array_equal(out[i, 1], np.asarray(data[b]))


def test_batch_cross_snr_diagonal_matches_batch_snr():
    rng = np.random.RandomState(6)
    clear = rng.randn(3, 2, 8, 4).astype(np.float32)
    noisy = clear + 0.2 * rng.randn(3, 2, 8, 4).astype(np.float32)
    cross = np.asarray(L.batch_cross_snr(
        jnp.asarray(clear), jnp.asarray(noisy)))
    assert cross.shape == (3, 2, 2)
    # diagonal = per-source SNR computed directly
    for i in range(2):
        direct = np.asarray(L.batch_snr(
            jnp.asarray(clear[:, i]), jnp.asarray(noisy[:, i])))
        np.testing.assert_allclose(cross[:, i, i], direct, rtol=1e-4)


def _np_si_snr(t, e, eps=1e-8):
    t = t - t.mean(-1, keepdims=True)
    e = e - e.mean(-1, keepdims=True)
    proj = (t * e).sum(-1, keepdims=True) / ((t * t).sum(-1, keepdims=True)
                                             + eps) * t
    noise = e - proj
    return 10 * np.log10((proj * proj).sum(-1)
                         / ((noise * noise).sum(-1) + eps) + eps)


def test_pit_si_snr_matches_brute_force():
    rng = np.random.RandomState(5)
    b, n, ln = 3, 3, 64
    t = rng.randn(b, n, ln).astype(np.float32)
    e = rng.randn(b, n, ln).astype(np.float32)
    loss, perms, perm_idx = L.pit_si_snr_loss(jnp.asarray(t), jnp.asarray(e))
    best = np.full(b, -np.inf)
    for bi in range(b):
        for perm in itertools.permutations(range(n)):
            score = np.mean([_np_si_snr(t[bi, i], e[bi, perm[i]])
                             for i in range(n)])
            best[bi] = max(best[bi], score)
    np.testing.assert_allclose(float(loss), -best.mean(), rtol=1e-4)


def test_pit_si_snr_gram_gradients_match_elementwise():
    """pit_si_snr_loss's Gram-form cross matrix (pairwise dots GEMM, no
    [B,N,N,L] broadcasts) must match the elementwise-projection
    formulation in value AND gradient."""
    import jax
    from math import factorial as fact

    rng = np.random.RandomState(9)
    b, n, ln = 4, 3, 96
    t = rng.randn(b, n, ln).astype(np.float32)
    e = rng.randn(b, n, ln).astype(np.float32)

    def elementwise(ej):
        onehot = np.zeros((fact(n), n, n), dtype=np.float32)
        perms = L.permutations_array(n)
        onehot[np.arange(fact(n))[:, None],
               np.arange(n)[None, :], perms] = 1.0
        cross = L.si_snr(jnp.asarray(t)[:, :, None], ej[:, None], 1e-8)
        scores = jnp.einsum("bij,pij->bp", cross, jnp.asarray(onehot)) / n
        idx = jnp.argmax(scores, axis=1)
        return -jnp.mean(jnp.take_along_axis(scores, idx[:, None], axis=1))

    def gram(ej):
        return L.pit_si_snr_loss(jnp.asarray(t), ej)[0]

    lg, gg = jax.value_and_grad(gram)(jnp.asarray(e))
    le, ge = jax.value_and_grad(elementwise)(jnp.asarray(e))
    np.testing.assert_allclose(float(lg), float(le), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(ge),
                               rtol=1e-3, atol=1e-5)


def test_pit_si_snr_recovers_permutation_and_scale():
    """Scaled + permuted copies of the targets score near-perfect SI-SNR
    and the chosen permutation un-permutes them back."""
    rng = np.random.RandomState(6)
    t = rng.randn(2, 2, 128).astype(np.float32)
    e = t[:, ::-1] * 0.3  # swapped sources, scaled
    loss, perms, perm_idx = L.pit_si_snr_loss(jnp.asarray(t), jnp.asarray(e))
    assert float(loss) < -40.0  # SI-SNR is scale-invariant: near-perfect
    restored = L.unpermute(jnp.asarray(e), perms, perm_idx)
    np.testing.assert_allclose(np.asarray(restored), t * 0.3, atol=1e-6)


def _np_bss_eval(ref, est, filt_len):
    """Oracle BSS-eval: explicit delayed-reference design matrix + lstsq
    (structurally independent of the FFT/Toeplitz implementation)."""
    n, t = ref.shape
    ell = filt_len
    tl = t + ell - 1
    A = np.zeros((tl, n * ell))
    for j in range(n):
        for a in range(ell):
            A[a:a + t, j * ell + a] = ref[j]
    out = {"sdr": [], "sir": [], "sar": []}
    for i in range(n):
        e = np.zeros(tl)
        e[:t] = est[i]
        h_all, *_ = np.linalg.lstsq(A, e, rcond=None)
        p_all = A @ h_all
        aj = A[:, i * ell:(i + 1) * ell]
        h_own, *_ = np.linalg.lstsq(aj, e, rcond=None)
        s_target = aj @ h_own
        e_interf = p_all - s_target
        e_artif = e - p_all
        db = lambda a_, b_: 10 * np.log10(np.sum(a_ ** 2) / np.sum(b_ ** 2))
        out["sdr"].append(db(s_target, e_interf + e_artif))
        out["sir"].append(db(s_target, e_interf))
        out["sar"].append(db(s_target + e_interf, e_artif))
    return {k: np.asarray(v) for k, v in out.items()}


def test_bss_eval_matches_lstsq_oracle():
    rng = np.random.RandomState(7)
    n, t, ell = 2, 400, 8
    ref = rng.randn(n, t).astype(np.float32)
    # estimates: filtered own source + interference + artifacts
    est = np.stack([
        np.convolve(ref[0], [0.9, 0.2, -0.1])[:t] + 0.3 * ref[1]
        + 0.1 * rng.randn(t),
        0.8 * ref[1] + 0.2 * np.roll(ref[0], 3) + 0.05 * rng.randn(t),
    ]).astype(np.float32)
    got = L.bss_eval_sources(jnp.asarray(ref), jnp.asarray(est),
                             filt_len=ell)
    want = _np_bss_eval(ref.astype(np.float64), est.astype(np.float64), ell)
    for k in ("sdr", "sir", "sar"):
        np.testing.assert_allclose(np.asarray(got[k]), want[k], atol=0.05,
                                   err_msg=k)


def test_bss_eval_distortion_filter_allowance():
    """An estimate that is only an FIR-filtered copy of its source (taps <
    filt_len) is a perfect separation under BSS-eval SDR, while SI-SNR
    (no filter allowance) penalizes it heavily."""
    rng = np.random.RandomState(8)
    ref = rng.randn(2, 512).astype(np.float32)
    fir = np.array([0.5, -0.8, 0.2, 0.1])
    est = np.stack([np.convolve(ref[i], fir)[:512] for i in range(2)])
    out = L.bss_eval_sources(jnp.asarray(ref), jnp.asarray(est.astype(
        np.float32)), filt_len=32)
    # f32 Gram-solve precision caps a *perfect* estimate at ~27-31 dB;
    # real separations sit far below that ceiling.
    assert float(np.min(np.asarray(out["sdr"]))) > 25.0
    si = L.si_snr(jnp.asarray(ref), jnp.asarray(est.astype(np.float32)))
    assert float(np.max(np.asarray(si))) < 10.0


def _naive_dc(embed, labels, w=None):
    """Oracle: materialized-affinity deep-clustering loss,
    mean_b ||VV^T - YY^T||_F^2 / (TF)^2 with sqrt(w)-scaled rows."""
    b, tf_, e = embed.shape
    n = int(labels.max()) + 1
    out = 0.0
    for bi in range(b):
        v = embed[bi] / np.sqrt(
            np.sum(embed[bi] ** 2, -1, keepdims=True) + 1e-8)
        y = np.eye(n, dtype=np.float64)[labels[bi]]
        if w is not None:
            wb = w[bi] * (tf_ / w[bi].sum())
            v = v * np.sqrt(wb)[:, None]
            y = y * np.sqrt(wb)[:, None]
        a = v @ v.T - y @ y.T
        out += np.sum(a * a)
    return out / b / tf_ ** 2


def test_dc_loss_matches_naive_affinity():
    rng = np.random.RandomState(7)
    b, t, f, e, n = 3, 6, 5, 4, 2
    embed = rng.randn(b, t, f, e).astype(np.float32)
    src_pwr = rng.rand(b, n, t, f).astype(np.float32)
    labels = np.argmax(src_pwr, axis=1).reshape(b, t * f)
    got = float(L.dc_loss(jnp.asarray(embed), jnp.asarray(src_pwr)))
    ref = _naive_dc(embed.reshape(b, t * f, e).astype(np.float64), labels)
    np.testing.assert_allclose(got, ref, rtol=1e-4)
    # magnitude-ratio weighted variant
    mix = rng.rand(b, t, f).astype(np.float32) + 0.1
    got_w = float(L.dc_loss(jnp.asarray(embed), jnp.asarray(src_pwr),
                            weights=jnp.asarray(mix)))
    ref_w = _naive_dc(embed.reshape(b, t * f, e).astype(np.float64),
                      labels, w=mix.reshape(b, t * f).astype(np.float64))
    np.testing.assert_allclose(got_w, ref_w, rtol=1e-4)
    assert not np.isclose(got, got_w)


def test_dc_loss_zero_for_ideal_embedding():
    """Embeddings equal to the one-hot cluster indicators give VV^T ==
    YY^T, so the loss vanishes; random embeddings do not."""
    rng = np.random.RandomState(8)
    b, t, f, n = 2, 4, 3, 2
    src_pwr = rng.rand(b, n, t, f).astype(np.float32)
    labels = np.argmax(src_pwr, axis=1)
    ideal = np.eye(n, dtype=np.float32)[labels]      # [B,T,F,E=N]
    z = float(L.dc_loss(jnp.asarray(ideal), jnp.asarray(src_pwr)))
    assert abs(z) < 1e-6
    rand = rng.randn(b, t, f, n).astype(np.float32)
    assert float(L.dc_loss(jnp.asarray(rand), jnp.asarray(src_pwr))) > z


def test_pit_mse_masked_ri_matches_composed_path():
    """The fused masked-PIT tail (pit_mse_masked_ri) must equal the
    composed pipeline it replaces — materialize sep_ri = m * p, PIT
    complex-MSE, unpermute, batch_snr — in loss, chosen permutation, SNR,
    AND gradients (wrt both the masks and the targets)."""
    import jax
    rng = np.random.RandomState(0)
    b, n, t, f = 3, 3, 8, 5
    eps = 1e-7
    src = rng.randn(b, n, t, f, 2).astype(np.float32)
    m = np.abs(rng.randn(b, n, t, f)).astype(np.float32)
    mix = src.sum(axis=1)
    mix_mag = np.sqrt((mix ** 2).sum(-1))
    p = (mix / (mix_mag[..., None] + eps)).astype(np.float32)  # eps-guarded

    def composed(src_ri, sep_pwr):
        sep_ri = sep_pwr[..., None] * jnp.asarray(p)[:, None]
        loss, perms, perm_idx = L.pit_mse_loss(
            src_ri, sep_ri, complex_ri=True)
        sep_pit = L.unpermute(sep_ri, perms, perm_idx)
        snr = L.batch_snr(src_ri, sep_pit, eps=eps, complex_ri=True)
        return loss, perm_idx, snr

    def fused(src_ri, sep_pwr):
        loss, _, perm_idx, snr = L.pit_mse_masked_ri(
            src_ri, sep_pwr, jnp.asarray(p), eps=eps)
        return loss, perm_idx, snr

    l0, pi0, s0 = composed(jnp.asarray(src), jnp.asarray(m))
    l1, pi1, s1 = fused(jnp.asarray(src), jnp.asarray(m))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(pi0), np.asarray(pi1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-4)

    g0 = jax.grad(lambda a, c: composed(a, c)[0], argnums=(0, 1))(
        jnp.asarray(src), jnp.asarray(m))
    g1 = jax.grad(lambda a, c: fused(a, c)[0], argnums=(0, 1))(
        jnp.asarray(src), jnp.asarray(m))
    for a, c in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-6)
