"""Command-line entry points: convert / separate / preprocess / train / index.

Replaces the reference's scattered CLIs (uvr5_cli.py, training_cli.py,
slicer2 main) with one typed CLI over the pipelines.
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def _add_convert(sub):
    p = sub.add_parser("convert", help="RVC voice conversion")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--model", required=True, help=".pth checkpoint")
    p.add_argument("--hubert", required=True, help="content-vec safetensors")
    p.add_argument("--rmvpe", default="", help="rmvpe.pt (for f0_method=rmvpe)")
    p.add_argument("--index", default="", help="retrieval bank .npy")
    p.add_argument("--f0-up-key", type=float, default=0)
    p.add_argument("--f0-method", default="rmvpe")
    p.add_argument("--index-rate", type=float, default=0.75)
    p.add_argument("--protect", type=float, default=0.33)
    p.add_argument("--rms-mix-rate", type=float, default=0.25)
    p.add_argument("--resample-sr", type=int, default=0)
    p.add_argument("--sid", type=int, default=0)


def cmd_convert(args):
    import numpy as np

    from ..compat.torch_import import (
        load_hubert_safetensors,
        load_rmvpe,
        load_rvc_checkpoint,
        synthesizer_kwargs_from_config,
    )
    from ..io.audio import load_input_audio, save_input_audio
    from ..pipelines.convert import ConvertSettings, VoiceConverter
    from ..pitch.extractor import PitchExtractor

    params, meta = load_rvc_checkpoint(args.model)
    kwargs = synthesizer_kwargs_from_config(meta["config"], meta["version"], bool(meta["f0"]))
    hparams, hcfg = load_hubert_safetensors(args.hubert)
    extractor = None
    if args.rmvpe:
        extractor = PitchExtractor(rmvpe_params=load_rmvpe(args.rmvpe))
    bank = np.load(args.index) if args.index else None
    vc = VoiceConverter(params, kwargs, hparams, hcfg, pitch=extractor, index_bank=bank)
    audio, sr = load_input_audio(args.input, 16000)
    out, out_sr = vc.convert(audio, sr, ConvertSettings(
        sid=args.sid, f0_up_key=args.f0_up_key, f0_method=args.f0_method,
        index_rate=args.index_rate, protect=args.protect,
        rms_mix_rate=args.rms_mix_rate, resample_sr=args.resample_sr,
    ))
    save_input_audio(args.output, (out, out_sr))
    print(f"wrote {args.output} ({out_sr} Hz)")


def _add_separate(sub):
    p = sub.add_parser("separate", help="vocal/instrumental separation")
    p.add_argument("input")
    p.add_argument("output_dir")
    p.add_argument("--model", required=True)
    p.add_argument("--agg", type=float, default=10.0)


def cmd_separate(args):
    from ..graph.nodes import _load_separator
    from ..io.audio import load_input_audio, save_input_audio
    from ..pipelines.separate import route_separator

    audio, sr = load_input_audio(args.input)
    kind = route_separator(args.model)
    sep = _load_separator(kind, args.model, args.agg)
    out = sep.run_inference(audio, sr)
    os.makedirs(args.output_dir, exist_ok=True)
    for stem in ("vocals", "instrumentals"):
        path = os.path.join(args.output_dir, f"{stem}.wav")
        save_input_audio(path, out[stem])
        print(f"wrote {path}")


def _add_preprocess(sub):
    p = sub.add_parser("preprocess", help="build a training dataset")
    p.add_argument("input_dir")
    p.add_argument("exp_dir")
    p.add_argument("--sr", default="40k", choices=["32k", "40k", "48k"])
    p.add_argument("--hubert", required=True)
    p.add_argument("--rmvpe", default="")
    p.add_argument("--f0-method", default="rmvpe")
    p.add_argument("--version", default="v2", choices=["v1", "v2"])


def cmd_preprocess(args):
    from ..compat.torch_import import load_hubert_safetensors, load_rmvpe
    from ..config import SR_MAP
    from ..pipelines.preprocess import (
        Preprocess,
        build_filelist,
        extract_features,
        generate_mute_fixtures,
    )
    from ..pitch.extractor import PitchExtractor

    sr = SR_MAP[args.sr]
    hparams, hcfg = load_hubert_safetensors(args.hubert)
    extractor = PitchExtractor(rmvpe_params=load_rmvpe(args.rmvpe)) if args.rmvpe else None
    n = Preprocess(sr, args.exp_dir).run_dir(args.input_dir)
    print(f"sliced {n} clips")
    extract_features(args.exp_dir, hparams, hcfg, pitch=extractor,
                     f0_method=args.f0_method, version=args.version)
    mute = os.path.join(args.exp_dir, "mute")
    generate_mute_fixtures(mute, sr, args.version)
    filelist = build_filelist(args.exp_dir, sr, version=args.version, mute_dir=mute)
    print(f"filelist: {filelist}")


def _add_train(sub):
    p = sub.add_parser("train", help="train an RVC model")
    p.add_argument("filelist")
    p.add_argument("model_dir")
    p.add_argument("--preset", default="40k_v2")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--save-every", type=int, default=10)
    p.add_argument("--pretrained-g", default="")
    p.add_argument("--pretrained-d", default="")
    p.add_argument("--name", default="model")


def cmd_train(args):
    import dataclasses

    from ..config import preset
    from ..pipelines.train import TrainRunConfig, train_model

    cfg = preset(args.preset)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, epochs=args.epochs, batch_size=args.batch_size))
    run = TrainRunConfig(
        model_dir=args.model_dir, filelist=args.filelist, total_epochs=args.epochs,
        save_every_epoch=args.save_every, export_name=args.name,
        pretrained_g=args.pretrained_g or None, pretrained_d=args.pretrained_d or None,
    )
    print("exported:", train_model(cfg, run))


def _add_index(sub):
    p = sub.add_parser("index", help="build a retrieval bank from features")
    p.add_argument("exp_dir")
    p.add_argument("--version", default="v2")


def cmd_index(args):
    import numpy as np

    from ..retrieval.index import train_index

    feat_dir = os.path.join(
        args.exp_dir, "3_feature256" if args.version == "v1" else "3_feature768")
    feats = np.concatenate(
        [np.load(os.path.join(feat_dir, f)) for f in sorted(os.listdir(feat_dir))])
    index = train_index(feats)
    out = os.path.join(args.exp_dir, "index.npy")
    index.save(out)
    print(f"wrote {out} ({index.ntotal} rows)")


def main(argv=None):
    parser = argparse.ArgumentParser("rvc_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    _add_convert(sub)
    _add_separate(sub)
    _add_preprocess(sub)
    _add_train(sub)
    _add_index(sub)
    args = parser.parse_args(argv)
    {"convert": cmd_convert, "separate": cmd_separate, "preprocess": cmd_preprocess,
     "train": cmd_train, "index": cmd_index}[args.cmd](args)


if __name__ == "__main__":
    main()
