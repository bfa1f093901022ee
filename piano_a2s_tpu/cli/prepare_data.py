"""Offline dataset preparation (synthesis + ASAP preprocessing).

Mirrors the reference's two entries (reference: data_processing/render.py
__main__ and datasets/asap.py __main__):

    python prepare_data.py syn configs/pretrain.yaml [stages...]
    python prepare_data.py asap configs/finetune.yaml

Stages for `syn` (default: all): convert, preprocess, split, midi, clean,
render, spectrograms. External tools (verovio, fluidsynth, virtuosoNet) are
required only by the stages that use them; everything else is native.
"""

import argparse
import os
import sys
from multiprocessing import Pool
from functools import partial

ALL_STAGES = ["convert", "preprocess", "split", "midi", "clean", "render",
              "spectrograms"]


def run_syn(exp, stages, kern_folder, xml_folder):
    from piano_a2s_tpu.data import render as R
    versions = list(range(int(exp.extras.get("train_versions", 10))))
    if not versions:
        print("train_versions is 0 — nothing to do")
        return
    version_groups = [versions[i:i + 2] for i in range(0, len(versions), 2)]
    pool_size = max(1, min(5, len(version_groups)))

    if "convert" in stages:
        print("Converting MuseSyn xml files to kern...")
        R.convert_xml_to_kern(xml_folder, kern_folder)
    if "preprocess" in stages:
        print("Preprocessing kern files...")
        R.preprocess_kern(kern_folder)
    if "split" in stages:
        print("Splitting scores into chunks...")
        work = partial(R.split_datasets, feature_folder=exp.feature_folder,
                       kern_folder=kern_folder, seed=exp.seed)
        with Pool(processes=pool_size) as pool:
            pool.map(work, version_groups)
    if "midi" in stages:
        print("Converting xml to midi...")
        epr_generate = None
        if exp.midi_syn == "epr":
            # Engine selection mirrors the MV2H/MUSTER pattern: the
            # external tool (virtuosoNet) is canonical when present; the
            # native rule-based renderer covers tool-free hosts.
            #   auto (default): virtuosoNet if a checkout is found, else
            #     native with a notice;  virtuosonet: fail fast if absent;
            #   native: always the in-repo engine.
            engine = str(exp.extras.get("epr_engine", "auto"))
            from piano_a2s_tpu.data.epr import (find_virtuosonet,
                                                make_epr_generator)
            if engine not in ("auto", "virtuosonet", "native"):
                raise SystemExit(f"epr_engine={engine!r}: expected "
                                 "auto|virtuosonet|native")
            vnet = None
            if engine in ("auto", "virtuosonet"):
                vnet = find_virtuosonet(exp.extras.get("virtuosonet_path"),
                                        workspace=exp.workspace)
            if engine == "virtuosonet" or (engine == "auto" and vnet):
                # Pass the found checkout as the explicit root so the
                # generator binds to exactly the checkout announced here
                # (no second discovery pass). vnet None here means
                # engine=virtuosonet with nothing found: make_epr_generator
                # fails fast with install instructions.
                epr_generate = make_epr_generator(
                    vnet or exp.extras.get("virtuosonet_path"),
                    workspace=exp.workspace)
                print(f"EPR engine: virtuosoNet ({vnet})")
            else:
                if engine == "auto":
                    print("EPR engine: native rule-based renderer "
                          "(no virtuosoNet checkout found; set "
                          "epr_engine=virtuosonet to require the tool)")
                else:
                    print("EPR engine: native rule-based renderer "
                          "(selected via epr_engine)")
                from piano_a2s_tpu.data.epr_native import (
                    make_native_epr_generator)
                # Stage inside the workspace when one is configured (the
                # default tempdir is auto-removed at exit either way).
                staging = (os.path.join(exp.workspace, "epr_native_tmp")
                           if exp.workspace else None)
                epr_generate = make_native_epr_generator(staging)
        R.xml_to_midi(versions, exp.feature_folder, midi_syn=exp.midi_syn,
                      seed=exp.seed, epr_generate=epr_generate)
    if "clean" in stages:
        print("Cleaning files...")
        n = R.clean_files(versions, exp.feature_folder)
        print(f"deleted {n} invalid clips")
    if "render" in stages:
        print("Synthesizing audio...")
        soundfont_folder = exp.extras.get("soundfont_folder", "soundfonts")
        work = partial(R.render_all_midi, feature_folder=exp.feature_folder,
                       soundfont_folder=soundfont_folder, seed=exp.seed)
        with Pool(processes=pool_size) as pool:
            pool.map(work, version_groups)
    if "spectrograms" in stages:
        print("Preparing spectrograms...")
        work = partial(R.prepare_spectrograms,
                       feature_folder=exp.feature_folder,
                       sample_rate=exp.sample_rate,
                       max_duration=exp.max_duration)
        with Pool(processes=pool_size) as pool:
            pool.map(work, version_groups)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset", choices=["syn", "asap"])
    parser.add_argument("hparams")
    parser.add_argument("stages", nargs="*", default=[],
                        help=f"syn stages subset of {ALL_STAGES}; "
                             "key=value args are config overrides")
    parser.add_argument("--kern-folder", default="data_processing/kern")
    parser.add_argument("--xml-folder", default="data_processing/xml")
    args = parser.parse_args(argv)

    overrides = [s for s in args.stages if "=" in s]
    args.stages = [s for s in args.stages if "=" not in s]

    from piano_a2s_tpu.config import load_experiment
    exp = load_experiment(args.hparams, overrides)

    if args.dataset == "syn":
        stages = args.stages or ALL_STAGES
        unknown = [s for s in stages if s not in ALL_STAGES]
        if unknown:
            parser.error(f"unknown stage(s) {unknown}; valid: {ALL_STAGES}")
        run_syn(exp, stages, args.kern_folder, args.xml_folder)
    else:
        from piano_a2s_tpu.data.asap import ProcessASAP
        proc = ProcessASAP(exp.asap_folder, exp.feature_folder,
                           sample_rate=exp.sample_rate,
                           max_duration=exp.max_duration)
        unmatched = proc.process_all()
        print(f"done; {len(unmatched)} unmatched performances")
    return 0


if __name__ == "__main__":
    sys.exit(main())
