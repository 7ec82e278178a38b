"""Generated configs must match the reference's recipes key-for-key.

Intended deviations: dataset paths are rooted at data/ instead of the
reference author's home directory, and pesq/metadata paths follow. Everything
else (model kwargs, losses, optimizer groups, schedules, batch sizes) must be
identical — these are the published recipes.
"""
import glob
import os

import pytest
import yaml

from fastenhancer_tpu.configs import build_all
from fastenhancer_tpu.utils.hparams import get_hparams, HParams, update_params

REF = "/root/reference/configs"


def _flat(d, p=""):
    out = {}
    items = (d.items() if isinstance(d, dict)
             else ((str(i), v) for i, v in enumerate(d)))
    for k, v in items:
        kk = f"{p}.{k}" if p else k
        if isinstance(v, (dict, list)):
            out.update(_flat(v, kk))
        else:
            out[kk] = v
    return out


def _is_path_key(key: str) -> bool:
    return key.endswith(("_dir", "metadata"))


REF_FILES = sorted(
    os.path.relpath(f, REF)[:-5]
    for f in glob.glob(f"{REF}/**/*.yaml", recursive=True)
)


@pytest.fixture(scope="module")
def built():
    return build_all()


@pytest.mark.parametrize("rel", REF_FILES)
def test_config_matches_reference(rel, built):
    assert rel in built, f"missing generated config: {rel}"
    ours = _flat(built[rel])
    ref = _flat(yaml.safe_load(open(f"{REF}/{rel}.yaml")))
    only_ref = set(ref) - set(ours)
    only_ours = set(ours) - set(ref)
    assert not only_ref, f"{rel}: missing keys {sorted(only_ref)}"
    assert not only_ours, f"{rel}: extra keys {sorted(only_ours)}"
    diffs = {
        k: (ours[k], ref[k]) for k in ref
        if ours[k] != ref[k] and not _is_path_key(k)
    }
    assert not diffs, f"{rel}: value mismatches {diffs}"


def test_hparams_roundtrip(tmp_path):
    cfg = build_all()["fastenhancer/t"]
    path = tmp_path / "t.yaml"
    path.write_text(yaml.dump(cfg, sort_keys=False))
    hps = get_hparams(str(path), base_dir=str(tmp_path / "run"), save=True,
                      params=["train.batch_size=8",
                              "model_kwargs.rnnformer_kwargs.num_blocks=1"])
    assert hps.train.batch_size == 8
    assert hps.model_kwargs.rnnformer_kwargs.num_blocks == 1
    assert hps.model == "fastenhancer.default"
    assert "losses" in hps.train
    # resume path: config.yaml saved in run dir
    hps2 = get_hparams(None, base_dir=str(tmp_path / "run"))
    assert hps2.train.batch_size == 8
    # refusing silent overwrite
    with pytest.raises(FileExistsError):
        get_hparams(str(path), base_dir=str(tmp_path / "run"), save=True)


def test_hparams_loads_reference_yaml_unchanged():
    hps = get_hparams(f"{REF}/fastenhancer/b.yaml", base_dir="")
    assert hps.model_kwargs.channels == 48
    assert hps.train.optimizer == "AdamP"
    assert len(hps.train.optimizer_groups) == 3


def test_update_params_unknown_key_raises():
    cfg = {"a": 1, "b": {"c": 2}}
    with pytest.raises(RuntimeError):
        update_params(cfg, ["b.zzz=3"])
    update_params(cfg, ["b.c=7", "a=[1,2]"])
    assert cfg["b"]["c"] == 7 and cfg["a"] == [1, 2]


def test_hparams_mapping_protocol():
    hp = HParams(**{"x": 1, "y": {"z": "s"}})
    assert hp["x"] == 1 and hp.y.z == "s"
    assert "y" in hp and "q" not in hp
    assert dict(hp.y.items()) == {"z": "s"}
    assert hp.to_dict() == {"x": 1, "y": {"z": "s"}}
