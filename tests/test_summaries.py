"""TensorBoard summary helpers (reference lib/train/utils.py summarize +
plot_spectrogram_to_numpy, used by training_cli.py:604-663)."""
import numpy as np

from rvc_tpu.train.summaries import plot_spectrogram_to_numpy, summarize


def test_plot_spectrogram_shapes_and_orientation():
    spec = np.zeros((32, 100), np.float32)
    spec[0, :] = 1.0  # lowest mel bin hot
    img = plot_spectrogram_to_numpy(spec)
    assert img.shape == (32, 100, 3) and img.dtype == np.uint8
    # low frequencies render at the BOTTOM row (origin='lower')
    assert img[-1, 0].sum() > img[0, 0].sum()
    # constant input doesn't divide by zero
    flat = plot_spectrogram_to_numpy(np.ones((8, 8), np.float32))
    assert flat.shape == (8, 8, 3)
    hot = plot_spectrogram_to_numpy(spec, cmap="hot")
    assert hot.shape == (32, 100, 3)


class _FakeWriter:
    def __init__(self):
        self.scalars, self.images, self.audios = {}, {}, {}

    def add_scalar(self, k, v, step):
        self.scalars[k] = (v, step)

    def add_image(self, k, v, step, dataformats=None):
        self.images[k] = (v.shape, dataformats)

    def add_audio(self, k, v, step, sample_rate=None):
        self.audios[k] = (v.shape, sample_rate, float(np.abs(v).max()))


def test_summarize_routes_all_kinds():
    w = _FakeWriter()
    summarize(w, 7,
              scalars={"loss/mel": 1.5},
              images={"slice/mel": np.zeros((4, 4, 3), np.uint8)},
              audios={"slice/wave": 3.0 * np.ones(16, np.float32)},
              audio_sampling_rate=40000)
    assert w.scalars["loss/mel"] == (1.5, 7)
    assert w.images["slice/mel"] == ((4, 4, 3), "HWC")
    shape, sr, peak = w.audios["slice/wave"]
    assert shape == (16, 1) and sr == 40000 and peak <= 1.0  # renormalized
