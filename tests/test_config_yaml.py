"""YAML config-file ingestion (round-3 verdict missing #3).

The reference merges YAML update files over generated configs
(tensorflow/config/utils.py:87-146, config/s3dis/adapt.yaml) and the whole
PyTorch stack is YAML-configured (pytorch/util/config.py). Here a YAML with
this repo's dotted/nested keys merges over a preset: preset < YAML < --set.
"""
import dataclasses

import pytest

from contrastboundary_tpu.config import load_config

# pytorch/config/s3dis/origin_multi-Ua-concat-latent_contrast-Ua-softnn-
# latent-label-l2-w.1.yaml, translated key-for-key into this repo's config
# namespace (DATA.voxel_size → data.voxel_size, TRAIN.step_epoch/multiplier →
# optim.milestones/multiplier, the head sections → the arch_out op-string)
TRANSLATED_FLAGSHIP_YAML = """\
_base: default
data:
  dataset: s3dis
  voxel_size: 0.04
  voxel_max: 80000
  n_points: 65536
  loop: 30
  num_classes: 13
model:
  layout: sorted
  sampler: strided
optim:
  base_lr: 0.5
  momentum: 0.9
  weight_decay: 0.0001
  schedule: multistep
  milestones: [0.6, 0.8]
  multiplier: 0.1
  epochs: 200
  batch_size: 16
arch_out: multi-Ua-concat-latent|contrast-Ua-softnn-latent-label-l2-w.1
"""


def test_translated_reference_yaml_reproduces_preset(tmp_path):
    p = tmp_path / "origin_cbl.yaml"
    p.write_text(TRANSLATED_FLAGSHIP_YAML)
    got = load_config(str(p))
    want = load_config("s3dis_pt_cbl")
    d_got, d_want = dataclasses.asdict(got), dataclasses.asdict(want)
    d_got.pop("name"), d_want.pop("name")
    assert d_got == d_want
    assert got.name == "origin_cbl"  # exp dirs keyed by the file stem


def test_cfg_file_merges_over_preset_and_set_wins(tmp_path):
    p = tmp_path / "upd.yaml"
    p.write_text("data.voxel_size: 0.02\noptim:\n  epochs: 7\n")
    cfg = load_config("s3dis_pt_cbl", cfg_file=str(p))
    assert cfg.data.voxel_size == 0.02 and cfg.optim.epochs == 7
    # everything else keeps the preset value
    assert cfg.optim.batch_size == 16
    # --set has the last word
    cfg = load_config("s3dis_pt_cbl", sets="optim.epochs:9", cfg_file=str(p))
    assert cfg.optim.epochs == 9 and cfg.data.voxel_size == 0.02


def test_yaml_error_paths(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("- a\n- b\n")
    with pytest.raises(ValueError, match="YAML mapping"):
        load_config(str(bad))
    unk = tmp_path / "unk.yaml"
    unk.write_text("_base: not_a_preset\n")
    with pytest.raises(KeyError, match="_base"):
        load_config(str(unk))
    typo = tmp_path / "typo.yaml"
    typo.write_text("data:\n  voxel_sizee: 0.02\n")
    with pytest.raises(KeyError, match="voxel_sizee"):
        load_config(str(typo))
