"""Native SPHERE decoder tests: PCM endianness, mu-law, shorten-v2
round-trips via the test-only encoder in shorten_ref.py."""
import numpy as np
import pytest

from tests.shorten_ref import encode_shorten_v2, make_sphere

sphere = pytest.importorskip("danet_tpu.native.sphere")


def _smooth_int16(n, seed=0, scale=500):
    rng = np.random.RandomState(seed)
    x = np.cumsum(rng.randint(-scale, scale, size=n))
    return np.clip(x, -30000, 30000).astype(np.int16)


def _roundtrip(path, payload, **kw):
    path.write_bytes(make_sphere(payload, **kw))
    return sphere.read_sphere(str(path))


def test_pcm_little_endian(tmp_path):
    x = _smooth_int16(3000)
    rate, out = _roundtrip(
        tmp_path / "le.sph", x.astype("<i2").tobytes(),
        coding="pcm", byte_format="01", sample_count=len(x))
    assert rate == 16000
    np.testing.assert_array_equal(out, x)


def test_pcm_big_endian(tmp_path):
    x = _smooth_int16(2000, seed=1)
    rate, out = _roundtrip(
        tmp_path / "be.sph", x.astype(">i2").tobytes(),
        coding="pcm", byte_format="10", sample_count=len(x))
    np.testing.assert_array_equal(out, x)


def _linear2ulaw(x):
    """Standard mu-law compressor (G.711)."""
    BIAS, CLIP = 0x84, 32635
    x = np.clip(np.asarray(x, np.int32), -CLIP, CLIP)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.abs(x) + BIAS
    exp = (np.floor(np.log2(mag)) - 7).clip(0, 7).astype(np.int32)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant)) & 0xFF


def test_ulaw(tmp_path):
    x = _smooth_int16(1500, seed=2, scale=200)
    codes = _linear2ulaw(x).astype(np.uint8)
    rate, out = _roundtrip(
        tmp_path / "ulaw.sph", codes.tobytes(),
        coding="ulaw", sample_n_bytes=1, sample_count=len(x))
    # mu-law is lossy: error bounded by the step of the relevant segment
    err = np.abs(out.astype(np.int32) - x.astype(np.int32))
    step = np.maximum(np.abs(x.astype(np.int32)) / 16, 32)
    assert (err <= step + 4).all()


def test_shorten_basic_roundtrip(tmp_path):
    x = _smooth_int16(5000)
    payload = encode_shorten_v2(x, blocksize=256)
    rate, out = _roundtrip(tmp_path / "sh.sph", payload,
                           sample_count=len(x))
    np.testing.assert_array_equal(out, x)


def test_shorten_with_means_and_verbatim(tmp_path):
    x = (_smooth_int16(4000, seed=3) + 700).astype(np.int16)  # DC offset
    payload = encode_shorten_v2(
        x, blocksize=128, nmean=4, verbatim_prefix=b"NIST_1A embedded hdr")
    rate, out = _roundtrip(tmp_path / "shm.sph", payload,
                           sample_count=len(x))
    np.testing.assert_array_equal(out, x)


def test_shorten_bitshift(tmp_path):
    x = (_smooth_int16(3000, seed=4) & ~3).astype(np.int16)  # /4 divisible
    payload = encode_shorten_v2(x, blocksize=256, bitshift=2)
    rate, out = _roundtrip(tmp_path / "shb.sph", payload,
                           sample_count=len(x))
    np.testing.assert_array_equal(out, x)


def test_shorten_partial_tail_block(tmp_path):
    x = _smooth_int16(1000 + 37, seed=5)  # not a blocksize multiple
    payload = encode_shorten_v2(x, blocksize=250)
    rate, out = _roundtrip(tmp_path / "sht.sph", payload,
                           sample_count=len(x))
    np.testing.assert_array_equal(out, x)


def test_corrupt_magic_raises(tmp_path):
    p = tmp_path / "bad.sph"
    p.write_bytes(b"GARBAGE!" * 200)
    with pytest.raises(IOError):
        sphere.read_sphere(str(p))


def test_truncated_shorten_raises(tmp_path):
    x = _smooth_int16(2000, seed=6)
    payload = encode_shorten_v2(x, blocksize=256)[:100]
    p = tmp_path / "trunc.sph"
    p.write_bytes(make_sphere(payload))
    with pytest.raises(IOError):
        sphere.read_sphere(str(p))


def test_batch_decode_parallel(tmp_path):
    """Thread-pooled batch decode: successes and failures interleaved."""
    from danet_tpu.native.sphere import read_sphere_batch
    paths = []
    refs = []
    for i in range(6):
        x = _smooth_int16(1000 + 100 * i, seed=10 + i)
        p = tmp_path / ("f%d.sph" % i)
        p.write_bytes(make_sphere(
            encode_shorten_v2(x, blocksize=128), sample_count=len(x)))
        paths.append(str(p))
        refs.append(x)
    bad = tmp_path / "bad.sph"
    bad.write_bytes(b"NOT A SPHERE FILE" * 10)
    paths.insert(3, str(bad))
    refs.insert(3, None)
    out = read_sphere_batch(paths, n_threads=4)
    assert len(out) == 7
    for res, ref in zip(out, refs):
        if ref is None:
            assert isinstance(res, IOError)
        else:
            rate, arr = res
            assert rate == 16000
            np.testing.assert_array_equal(arr, ref)


def test_shorten_qlpc_roundtrip(tmp_path):
    """Quantized-LPC blocks with the V2LPCQOFFSET rounding bias."""
    x = _smooth_int16(4000, seed=7)
    payload = encode_shorten_v2(x, blocksize=256, qlpc=[20, -6])
    rate, out = _roundtrip(tmp_path / "lpc.sph", payload,
                           sample_count=len(x))
    np.testing.assert_array_equal(out, x)


def test_shorten_qlpc_with_means(tmp_path):
    x = (_smooth_int16(3000, seed=8) + 500).astype(np.int16)
    payload = encode_shorten_v2(x, blocksize=128, nmean=4, qlpc=[25, -8, 3])
    rate, out = _roundtrip(tmp_path / "lpcm.sph", payload,
                           sample_count=len(x))
    np.testing.assert_array_equal(out, x)


def test_alaw_g711_sign_convention(tmp_path):
    """A-law: after the 0x55 XOR a set sign bit means positive (G.711)."""
    codes = np.array([0xD5, 0x55], dtype=np.uint8)  # +8 and -8 per G.711
    rate, out = _roundtrip(
        tmp_path / "alaw.sph", codes.tobytes(),
        coding="alaw", sample_n_bytes=1, sample_count=2)
    assert out[0] == 8 and out[1] == -8, out
