"""Whisper + MuseTalk component tests (tiny dims, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_tpu.models.whisper import (
    Whisper,
    WhisperDims,
    greedy_decode,
    log_mel_spectrogram,
)

TINY_W = WhisperDims(
    n_mels=80, n_audio_ctx=1500, n_audio_state=32, n_audio_head=2, n_audio_layer=2,
    n_vocab=100, n_text_ctx=64, n_text_state=32, n_text_head=2, n_text_layer=2,
)


def test_log_mel_shape(rng):
    x = jnp.asarray((0.1 * rng.standard_normal((1, 16000 * 2))).astype(np.float32))
    mel = log_mel_spectrogram(x)
    assert mel.shape == (1, 200, 80)
    m = np.asarray(mel)
    assert np.isfinite(m).all()
    # whisper normalization keeps values in (max-8+4)/4 .. (max+4)/4 ⊂ [-1, ~]
    assert m.min() >= (m.max() * 4 - 4 - 8 + 4) / 4 - 1e-5


@pytest.mark.heavy
def test_whisper_encoder_decoder(rng):
    model = Whisper(TINY_W)
    mel = jnp.asarray(rng.standard_normal((1, 100, 80)).astype(np.float32))
    tokens = jnp.asarray([[1, 2, 3]])
    params = model.init(jax.random.PRNGKey(0), mel, tokens)
    logits = model.apply(params, mel, tokens)
    assert logits.shape == (1, 3, 100)
    assert np.isfinite(np.asarray(logits)).all()
    # encoder layers output for MuseTalk features
    enc, layers = model.apply(params, mel, True, method=Whisper.embed_audio)
    assert enc.shape == (1, 50, 32)
    assert layers.shape == (1, 2, 50, 32)


def test_whisper_greedy_decode(rng):
    model = Whisper(TINY_W)
    mel = jnp.asarray(rng.standard_normal((1, 100, 80)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), mel, jnp.asarray([[1, 2]]))
    toks = greedy_decode(params, TINY_W, mel, sot_sequence=(1,), eot=0, max_len=8)
    assert toks.shape[0] == 1 and toks.shape[1] <= 8


@pytest.mark.heavy
def test_vae_roundtrip_shapes(rng):
    from rvc_tpu.models.musetalk.vae import AutoencoderKL, VAEConfig

    cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4)
    vae = AutoencoderKL(cfg)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    params = vae.init(jax.random.PRNGKey(0), x)
    z = vae.apply(params, x, method=AutoencoderKL.encode)
    assert z.shape == (1, 16, 16, 4)  # one downsample
    y = vae.apply(params, z, method=AutoencoderKL.decode)
    assert y.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.heavy
def test_unet_2d_condition(rng):
    from rvc_tpu.models.musetalk.unet import UNet2DCondition, UNetConfig

    cfg = UNetConfig(
        in_channels=8, out_channels=4, block_out_channels=(8, 16),
        layers_per_block=1, cross_attention_dim=12, attention_head_dim=2,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        norm_num_groups=4,
    )
    unet = UNet2DCondition(cfg)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((2, 10, 12)).astype(np.float32))
    from conftest import finit

    params = finit(unet, x, t, ctx)
    y = unet.apply(params, x, t, ctx)
    assert y.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(y)).all()


def test_audio2feature_slicing():
    from rvc_tpu.pipelines.musetalk import Audio2Feature

    feats = np.arange(100 * 4, dtype=np.float32).reshape(100, 4)
    window, idxs = Audio2Feature.get_sliced_feature(feats, vid_idx=10, fps=25)
    assert window.shape == (10, 4)  # 2*(2+2+1) rows
    assert idxs[0] == 10 * 2 - 4 and idxs[-1] == 10 * 2 + 5


def test_blend_face(rng):
    from rvc_tpu.pipelines.musetalk import blend_face

    frame = np.zeros((64, 64, 3), np.uint8)
    face = np.full((20, 20, 3), 255, np.uint8)
    out = blend_face(frame, face, (10, 10, 30, 30))
    assert out[20, 20].max() > 100  # center pasted
    assert out[50, 50].max() == 0  # outside untouched


@pytest.mark.heavy
def test_bisenet_shapes(rng):
    from rvc_tpu.models.musetalk.face import BiSeNet

    from conftest import finit

    net = BiSeNet(n_classes=19)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    params = finit(net, x)
    y = net.apply(params, x)
    assert y.shape == (1, 64, 64, 19)


@pytest.mark.heavy
def test_s3fd_shapes_and_decode(rng):
    from rvc_tpu.models.musetalk.face import S3FD, decode_s3fd, nms

    from conftest import finit

    net = S3FD()
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 3)).astype(np.float32))
    params = finit(net, x)
    outs = net.apply(params, x)
    assert len(outs) == 12
    assert outs[0].shape[1] == 32  # stride 4 map
    dets = decode_s3fd([np.asarray(o) for o in outs], scale_threshold=0.9)
    kept = nms(dets)
    assert kept.ndim == 2 and kept.shape[1] == 5


@pytest.mark.heavy
def test_whisper_detect_language(rng):
    """Language detection: one decoder step on SOT restricted to the
    language-token range; 'auto' splices the id into the SOT sequence."""
    import jax
    import jax.numpy as jnp
    import pytest

    from rvc_tpu.models.whisper import (WhisperDims, Whisper, detect_language,
                                        greedy_decode)

    dims = WhisperDims(n_mels=8, n_audio_ctx=10, n_audio_state=16,
                       n_audio_head=2, n_audio_layer=1, n_vocab=51865,
                       n_text_ctx=8, n_text_state=16, n_text_head=2,
                       n_text_layer=1)
    model = Whisper(dims)
    mel = jnp.asarray(rng.standard_normal((2, 20, 8)), jnp.float32)
    from conftest import finit

    params = finit(model, mel, jnp.zeros((2, 3), jnp.int32))
    ids, probs = detect_language(params, dims, mel)
    assert ids.shape == (2,) and probs.shape == (2,)
    assert all(50259 <= i <= 50357 for i in ids)
    assert np.all(probs > 0) and np.all(probs <= 1)

    toks = greedy_decode(params, dims, mel, max_len=3, language="auto")
    assert toks.shape[0] == 2

    en = WhisperDims(n_mels=8, n_audio_ctx=10, n_audio_state=16,
                     n_audio_head=2, n_audio_layer=1, n_vocab=51864,
                     n_text_ctx=8, n_text_state=16, n_text_head=2,
                     n_text_layer=1)
    with pytest.raises(ValueError, match="English-only"):
        detect_language(params, en, mel)


def test_decode_with_timestamps(rng):
    """Timestamp-token parsing: <|t0|> text <|t1|> pairs at 0.02 s steps
    (reference behavior: HF pipeline return_timestamps=True)."""
    from unittest import mock

    from rvc_tpu.models import whisper as W

    dims = WhisperDims(n_mels=8, n_audio_ctx=10, n_audio_state=16,
                       n_audio_head=2, n_audio_layer=1, n_vocab=51865,
                       n_text_ctx=32, n_text_state=16, n_text_head=2,
                       n_text_layer=1)
    ts = 50364  # timestamp_begin for the 51865 vocab
    fake = np.array([[ts + 0, 101, 102, ts + 50, ts + 50, 103, ts + 100, 50257]])

    with mock.patch.object(W, "greedy_decode", return_value=fake):
        segs = W.decode_with_timestamps(None, dims, jnp.zeros((1, 20, 8)))
    assert segs == [[(0.0, 1.0, [101, 102]), (1.0, 2.0, [103])]]

    # unterminated final segment gets a synthesized end
    fake2 = np.array([[ts + 10, 104, 105, 50257]])
    with mock.patch.object(W, "greedy_decode", return_value=fake2):
        segs2 = W.decode_with_timestamps(None, dims, jnp.zeros((1, 20, 8)))
    (s0, e0, toks0), = segs2[0]
    assert s0 == 0.2 and toks0 == [104, 105] and e0 > s0


@pytest.mark.heavy
def test_decode_with_timestamps_end_to_end(rng):
    """Real tiny model: segments are well-formed (monotonic, in-range)."""
    import jax

    from rvc_tpu.models.whisper import Whisper, decode_with_timestamps

    dims = WhisperDims(n_mels=8, n_audio_ctx=10, n_audio_state=16,
                       n_audio_head=2, n_audio_layer=1, n_vocab=51865,
                       n_text_ctx=16, n_text_state=16, n_text_head=2,
                       n_text_layer=1)
    model = Whisper(dims)
    mel = jnp.asarray(rng.standard_normal((1, 20, 8)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), mel, jnp.zeros((1, 3), jnp.int32))
    segs = decode_with_timestamps(params, dims, mel, max_len=8)
    assert len(segs) == 1
    for s, e, toks in segs[0]:
        assert 0 <= s <= e <= 31.0
        assert all(t < 50257 for t in toks)


@pytest.mark.heavy
def test_face_parser_and_parsed_blend(rng):
    """FaceParser batches BiSeNet over crops; blend_face_parsed only
    touches the lower (jaw) region of the expanded crop (reference
    blending.py:23-59 semantics)."""
    import jax

    from rvc_tpu.models.musetalk.face import BiSeNet
    from rvc_tpu.pipelines.musetalk import (
        FaceParser,
        _crop_box,
        _crop_padded,
        blend_face_parsed,
    )

    net = BiSeNet(n_classes=19)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3), jnp.float32))
    parser = FaceParser(params, size=64)
    crops = [np.full((40, 40, 3), 128, np.uint8),
             np.full((32, 48, 3), 64, np.uint8)]
    masks = parser(crops)
    assert masks[0].shape == (40, 40) and masks[1].shape == (32, 48)
    assert all(set(np.unique(m)) <= {0, 255} for m in masks)

    frame = np.zeros((64, 64, 3), np.uint8)
    face = np.full((20, 20, 3), 255, np.uint8)
    box = (10, 10, 30, 30)
    cbox, _ = _crop_box(box, 1.2)
    mask_crop = np.full(_crop_padded(frame, cbox).shape[:2], 255, np.uint8)
    out = blend_face_parsed(frame, face, box, mask_crop)
    assert out.shape == frame.shape
    # top half of the crop is zeroed -> upper face region stays black
    assert out[11, 20].max() == 0
    # jaw region pasted
    assert out[28, 20].max() > 100
    # far outside untouched
    assert out[60, 60].max() == 0

    # all-zero parse mask -> frame unchanged
    out2 = blend_face_parsed(frame, face, box, np.zeros_like(mask_crop))
    np.testing.assert_array_equal(out2, frame)


@pytest.mark.slow
@pytest.mark.parity
def test_fan_parity_vs_reference(rng):
    """FAN stacked-hourglass vs reference face_detection/models.py:145-202
    on identical random weights (eval mode, running stats)."""
    import importlib.util

    torch = pytest.importorskip("torch")

    spec = importlib.util.spec_from_file_location(
        "ref_fan_models",
        "/root/reference/lib/musetalk/utils/face_detection/models.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    tnet = ref.FAN(num_modules=2)
    tnet.eval()
    with torch.no_grad():  # give BN non-trivial running stats
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    sd = tnet.state_dict()

    from rvc_tpu.models.musetalk.face import (FAN, fan_params_from_state_dict,
                                              heatmaps_to_landmarks)

    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x))[-1].numpy()  # (1, 68, 16, 16)

    net = FAN(num_modules=2)
    variables = fan_params_from_state_dict(sd)  # already {"params": ...}
    got = net.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got_nchw = np.asarray(got).transpose(0, 3, 1, 2)
    assert got_nchw.shape == ref_out.shape
    assert np.max(np.abs(got_nchw - ref_out)) < 2e-4

    pts = np.asarray(heatmaps_to_landmarks(got))
    assert pts.shape == (1, 68, 2)
    assert (pts >= 0).all() and (pts <= 64).all()


def test_refine_box_with_landmarks():
    from rvc_tpu.pipelines.musetalk import refine_box_with_landmarks

    lm = np.zeros((68, 2), np.float32)
    lm[:, 0] = np.linspace(20, 80, 68)  # x extent 20..80
    lm[:, 1] = np.linspace(40, 100, 68)  # y extent 40..100
    lm[29] = (50, 70)  # nose bridge mid-face
    box = (10, 10, 90, 110)
    x1, y1, x2, y2 = refine_box_with_landmarks(box, lm)
    assert (x1, x2, y2) == (20, 80, 100)
    assert y1 == 40  # mirrored: 70 - (100 - 70)
    # bbox_shift moves the half-face line down → higher upper bound
    assert refine_box_with_landmarks(box, lm, bbox_shift=10)[1] == 60
    # degenerate refinement falls back to the detector box
    lm_bad = np.full((68, 2), -5.0, np.float32)
    assert refine_box_with_landmarks(box, lm_bad) == box


@pytest.mark.slow
def test_musetalk_landmark_refined_crops(rng):
    """FAN-refined detect path: pipeline.get_landmarks batches crops in one
    dispatch and maps points back to frame coordinates."""
    import jax

    from rvc_tpu.models.musetalk.face import FAN
    from rvc_tpu.pipelines.musetalk import MuseTalkPipeline

    net = FAN(num_modules=1)
    fan_params = net.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3), jnp.float32))
    pipe = object.__new__(MuseTalkPipeline)  # skip heavy __post_init__
    pipe.fan_params = fan_params
    pipe.dtype = jnp.float32
    frames = [(rng.random((120, 160, 3)) * 255).astype(np.uint8)
              for _ in range(2)]
    boxes = [(40, 20, 104, 84), (0, 0, 160, 120)]
    lms = MuseTalkPipeline.get_landmarks(pipe, frames, boxes, size=64)
    assert len(lms) == 2 and lms[0].shape == (68, 2)
    x1, y1, x2, y2 = boxes[0]
    assert (lms[0][:, 0] >= x1 - 1).all() and (lms[0][:, 0] <= x2 + 1).all()
    assert (lms[0][:, 1] >= y1 - 1).all() and (lms[0][:, 1] <= y2 + 1).all()


@pytest.mark.slow
@pytest.mark.parity
def test_beam_decode_parity_vs_reference_decoder(rng):
    """beam_decode vs the reference vendored BeamSearchDecoder/
    MaximumLikelihoodRanker (musetalk/whisper/whisper/decoding.py:281-368)
    driven by the SAME tiny-flax logits: identical token sequence."""
    import sys
    import types

    torch = pytest.importorskip("torch")

    stubbed = "ffmpeg" not in sys.modules
    if stubbed:  # whisper.audio imports ffmpeg at module scope
        sys.modules["ffmpeg"] = types.ModuleType("ffmpeg")
    sys.path.insert(0, "/root/reference/lib/musetalk/whisper")
    try:
        import whisper.decoding as D
    finally:
        sys.path.remove("/root/reference/lib/musetalk/whisper")

    from rvc_tpu.models.whisper import beam_decode

    dims = WhisperDims(n_mels=8, n_audio_ctx=10, n_audio_state=16,
                       n_audio_head=2, n_audio_layer=1, n_vocab=64,
                       n_text_ctx=24, n_text_state=16, n_text_head=2,
                       n_text_layer=1)
    model = Whisper(dims)
    mel = jnp.asarray(rng.standard_normal((1, 20, 8)), jnp.float32)
    params = model.init(jax.random.PRNGKey(3), mel, jnp.zeros((1, 2), jnp.int32))
    sot_seq, eot, beam, max_len = (1, 2), 0, 3, 12

    got_tokens, got_avg = beam_decode(
        params, dims, mel, beam_size=beam, sot_sequence=sot_seq, eot=eot,
        max_len=max_len)

    # ---- reference-side loop: same model logits through the torch decoder
    class _FakeInference:
        def rearrange_kv_cache(self, src):
            pass

    dec = D.BeamSearchDecoder(beam_size=beam, eot=eot,
                              inference=_FakeInference())
    audio = model.apply(params, mel, method=Whisper.embed_audio)
    audio_b = jnp.repeat(audio, beam, axis=0)
    tokens = torch.tensor([list(sot_seq)] * beam)
    sum_logprobs = torch.zeros(beam)
    completed = False
    for _ in range(max_len):
        tj = jnp.asarray(tokens.numpy().astype(np.int32))
        logits = model.apply(params, tj, audio_b, method=Whisper.logits)
        row = torch.from_numpy(np.asarray(logits[:, -1], np.float32))
        tokens, completed = dec.update(tokens, row, sum_logprobs)
        if completed:
            break
    seqs, lps = dec.finalize(tokens[None] if tokens.ndim == 2 else tokens,
                             sum_logprobs[None])
    ranker = D.MaximumLikelihoodRanker(None)
    sel = ranker.rank(seqs, lps)[0]
    ref_full = seqs[0][sel].tolist()
    ref_tokens = ref_full[len(sot_seq):]
    if ref_tokens and ref_tokens[-1] == eot:
        ref_tokens = ref_tokens[:-1]
    ref_avg = lps[0][sel] / (len(ref_tokens) + 1)

    if stubbed:
        sys.modules.pop("ffmpeg", None)
    for name, mod in list(sys.modules.items()):
        f = getattr(mod, "__file__", None)
        if f and str(f).startswith("/root/reference"):
            sys.modules.pop(name, None)

    assert got_tokens.tolist() == ref_tokens
    assert abs(got_avg - ref_avg) < 1e-4


def test_decode_with_fallback_ladder(rng, monkeypatch):
    """Degenerate beam output (low avg logprob) triggers temperature
    retries (reference transcribe.py decode_with_fallback)."""
    from rvc_tpu.models import whisper as W

    calls = []

    def fake_beam(params, dims, mel, **kw):
        calls.append(("beam", 0.0))
        return np.asarray([5, 5, 5, 5], np.int32), -3.0  # low confidence

    def fake_sample(params, dims, mel, temperature, **kw):
        calls.append(("sample", temperature))
        # recovers at t=0.4
        return (np.asarray([7, 8, 9], np.int32),
                -0.2 if temperature >= 0.4 else -3.0)

    monkeypatch.setattr(W, "beam_decode", fake_beam)
    monkeypatch.setattr(W, "_sample_decode", fake_sample)
    tokens, info = W.decode_with_fallback(None, None, None)
    assert tokens.tolist() == [7, 8, 9]
    assert info["temperature"] == 0.4 and info["avg_logprob"] == -0.2
    assert [c[1] for c in calls] == [0.0, 0.2, 0.4]
