import numpy as np

from proj_ray.audio import (AudioFeatures, make_audio_batch, n_samples_of,
                            synth_samples, wav_decode, wav_encode)


def test_wav_roundtrip():
    s = synth_samples(9, n_samples_of(9))
    out, sr = wav_decode(wav_encode(s))
    assert sr == 8000 and (out == s).all()
    # negative samples survive the int16 LE round-trip
    assert s.min() < 0


def test_features_exact():
    b = make_audio_batch(4, 2)
    out = AudioFeatures()(b)
    v = synth_samples(4, n_samples_of(4)).astype(np.int64)
    assert out["sum_sq"][0] == np.dot(v, v)
    sg = np.sign(v[v != 0])
    assert out["zero_x"][0] == np.count_nonzero(sg[1:] != sg[:-1])
    assert out["peak"][0] == np.abs(v).max()


def test_audio_dataset(ray_session):
    from proj_ray.audio import audio_dataset, audio_features

    out = audio_features(audio_dataset(25, parallelism=2)).to_pandas()
    assert len(out) == 25
    assert (out["peak"] <= 2048).all() and (out["sum_sq"] > 0).all()
