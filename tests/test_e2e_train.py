"""Full-loop integration: preprocess → features → filelist → train →
export .pth → reload → convert. Tiny models, CPU."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full GAN step
from scipy.io import wavfile

from rvc_tpu.config import RVCConfig, DataConfig, ModelConfig, TrainConfig
from rvc_tpu.models.hubert import HubertConfig, HubertEncoder
from rvc_tpu.pipelines.preprocess import (
    Preprocess,
    build_filelist,
    extract_features,
    generate_mute_fixtures,
)
from rvc_tpu.pitch.extractor import PitchExtractor
from rvc_tpu.train.data import BucketBatcher, RVCDataset

TINY_HUBERT = HubertConfig(
    hidden_size=16, num_hidden_layers=12, num_attention_heads=2,
    intermediate_size=32, conv_dim=(8,) * 7, conv_stride=(5, 2, 2, 2, 2, 2, 2),
    conv_kernel=(10, 3, 3, 3, 3, 2, 2), classifier_proj_size=8,
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
)

SR = 32000


@pytest.fixture(scope="module")
def exp_dir(tmp_path_factory):
    """Build a tiny dataset: 2 source files → clips → features/f0 → filelist."""
    root = tmp_path_factory.mktemp("exp")
    src = root / "src"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        t = np.arange(SR * 8) / SR
        f0 = 200 + 20 * np.sin(2 * np.pi * 0.3 * t + i)
        x = 0.4 * np.sin(2 * np.pi * np.cumsum(f0) / SR)
        x += 0.01 * rng.standard_normal(len(x))
        wavfile.write(str(src / f"in{i}.wav"), SR, x.astype(np.float32))

    exp = str(root / "dataset")
    pp = Preprocess(SR, exp)
    n = pp.run_dir(str(src))
    assert n > 0
    assert len(os.listdir(os.path.join(exp, "0_gt_wavs"))) >= 4

    hub = HubertEncoder(TINY_HUBERT)
    hp = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)), output_layer=12)
    done = extract_features(
        exp, hp, TINY_HUBERT, pitch=PitchExtractor(), f0_method="pm", version="v2",
        if_f0=True, batch_size=4,
    )
    assert done > 0

    mute = os.path.join(exp, "mute")
    generate_mute_fixtures(mute, SR, feat_dim=16)
    filelist = build_filelist(exp, SR, version="v2", if_f0=True, mute_dir=mute)
    assert os.path.exists(filelist)
    return exp, filelist, hp


def test_dataset_and_batcher(exp_dir):
    exp, filelist, _ = exp_dir
    data = DataConfig(sampling_rate=SR, filter_length=512, hop_length=320,
                      win_length=512, n_mel_channels=32)
    ds = RVCDataset(filelist, data, use_f0=True)
    assert len(ds) >= 4
    item = ds.load(0)
    assert item["phone"].shape[0] == item["spec"].shape[0]
    assert item["spec"].shape[1] == 257
    assert item["wave"].shape[0] == item["spec"].shape[0] * 320

    batcher = BucketBatcher(ds, batch_size=2)
    batches = list(batcher.epoch(0))
    assert batches
    b = batches[0]
    # static bucket shapes
    assert b["spec"].shape[1] in (100, 200, 300, 400, 500, 600, 700, 800, 900)
    assert b["phone"].shape[:2] == b["spec"].shape[:2]
    assert b["wave"].shape[1] == b["spec"].shape[1] * 320


def test_train_and_export_and_convert(exp_dir, tmp_path):
    from rvc_tpu.pipelines.train import TrainRunConfig, train_model
    from rvc_tpu.compat.torch_import import (
        load_rvc_checkpoint,
        synthesizer_kwargs_from_config,
    )
    from rvc_tpu.pipelines.convert import ConvertSettings, VoiceConverter

    cfg = RVCConfig(
        data=DataConfig(sampling_rate=SR, filter_length=512, hop_length=320,
                        win_length=512, n_mel_channels=32),
        model=ModelConfig(
            inter_channels=8, hidden_channels=8, filter_channels=16, n_heads=2,
            n_layers=1, kernel_size=3, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),), upsample_rates=(10, 8, 2, 2),
            upsample_initial_channel=16, upsample_kernel_sizes=(16, 16, 4, 4),
            gin_channels=8, spk_embed_dim=2, version="v2", use_f0=True,
        ),
        train=TrainConfig(batch_size=2, segment_size=6400, c_hd=0.0, c_tsi=0.0,
                          c_tefs=0.0, log_interval=1),
    )
    # tiny hubert features are 16-dim; adjust synth input dim accordingly
    exp, filelist, hubert_params = exp_dir
    run = TrainRunConfig(
        model_dir=str(tmp_path / "model"), filelist=filelist, total_epochs=1,
        save_every_epoch=1, export_name="tiny",
    )

    # patch feature_dim: our features are 16-dim (tiny hubert)
    import rvc_tpu.pipelines.train as tp
    from rvc_tpu.train.step import Trainer as RealTrainer

    class PatchedTrainer(RealTrainer):
        def __init__(self, config, **kw):
            super().__init__(config, **kw)
            object.__setattr__(self.synth, "feature_dim", 16)

    orig = tp.Trainer
    tp.Trainer = PatchedTrainer
    try:
        pth = train_model(cfg, run)
    finally:
        tp.Trainer = orig
    assert os.path.exists(pth)
    assert os.path.exists(os.path.join(run.model_dir, "losses.json"))

    # reload the exported checkpoint and run conversion with it
    params, meta = load_rvc_checkpoint(pth)
    assert meta["version"] == "v2" and meta["sr"] == SR
    kwargs = synthesizer_kwargs_from_config(meta["config"], "v2", True)
    kwargs["feature_dim"] = 16
    vc = VoiceConverter(
        params, kwargs, hubert_params, TINY_HUBERT,
        config=RVCConfig(x_pad=1, x_query=2, x_center=4, x_max=5),
    )
    t = np.arange(16000) / 16000
    x = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    out, sr = vc.convert(x, settings=ConvertSettings(f0_method="pm", index_rate=0.0))
    assert sr == SR
    assert np.abs(out).max() > 0
