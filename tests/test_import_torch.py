"""Torch checkpoint importer: round-trip through a synthetic .pth.

The reference trains with torch.save (SURVEY.md §2 "Checkpointing"); the
importer brings such weights into this framework via a user-supplied name
mapping (the reference mount is empty, so its exact names are unverifiable
— the mapping file IS the contract). This test builds a torch state_dict
that mirrors our own parameters (one entry transposed, linear-layer
style), imports it, and requires byte-exact round-trip plus a working
restore through the standard CLI path."""

import json

import jax
import numpy as np
import pytest

from controllable_xgating_tpu.cli import prepro as cli_prepro

torch = pytest.importorskip("torch")

import os  # noqa: E402
import sys  # noqa: E402

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
import import_torch_checkpoint as itc  # noqa: E402

SMALL = dict(hidden_dim=16, embed_dim=10, attn_dim=10, pos_embed_dim=10,
             num_frames=4)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("imp_corpus"))
    cli_prepro.main([
        "--out", d, "--fixtures", "--fixture_videos", "10",
        "--fixture_frames", "4", "--fixture_app_dim", "12",
        "--fixture_motion_dim", "8", "--max_caption_len", "10",
        "--seqs_per_video", "3",
    ])
    return d


def _small_args():
    out = []
    for k, v in SMALL.items():
        out += [f"--model.{k}", str(v)]
    return out


@pytest.mark.slow  # full import -> orbax -> CLI-restore round trip (~17 s)
def test_dump_template_and_roundtrip(corpus, tmp_path, capsys):
    # 1. template dump
    itc.main(["--data_dir", corpus, "--dump_template", *_small_args()])
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    paths = {r["path"]: tuple(r["shape"]) for r in rows}
    assert len(paths) > 20
    assert any(p.startswith("encoder.") for p in paths)
    assert any(p.startswith("decoder.") for p in paths)

    # 2. synthesize a torch checkpoint holding DIFFERENT values than init,
    #    with one 2-D entry stored transposed (torch Linear layout)
    rng = np.random.default_rng(0)
    sd, mapping = {}, {}
    transposed = next(p for p, s in paths.items() if len(s) == 2)
    for p, shape in paths.items():
        arr = rng.normal(size=shape).astype(np.float32)
        key = "ref." + p
        if p == transposed:
            sd[key] = torch.tensor(arr.T.copy())
            mapping[p] = {"key": key, "transform": "transpose"}
        else:
            sd[key] = torch.tensor(arr)
            mapping[p] = key
    pth = str(tmp_path / "model-best.pth")
    torch.save({"state_dict": sd}, pth)
    mf = str(tmp_path / "mapping.json")
    with open(mf, "w") as f:
        json.dump(mapping, f)

    # 3. import and restore through the standard checkpoint path
    out = str(tmp_path / "imported")
    itc.main(["--data_dir", corpus, "--pth", pth, "--mapping", mf,
              "--out", out, *_small_args()])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["imported"] == len(paths)
    assert rep["kept_initialized"] == 0

    from controllable_xgating_tpu.cli.common import (
        load_corpus, restore_params,
    )
    from controllable_xgating_tpu.utils.config import load_config

    cfg = load_config(None, {f"model.{k}": v for k, v in SMALL.items()})
    info, labels, store, cfg = load_corpus(corpus, cfg)
    params = restore_params(out, cfg, name="best")
    got = dict(itc.param_paths(params))
    for p in paths:
        want = np.asarray(sd["ref." + p].numpy())
        if p == transposed:
            want = want.T
        np.testing.assert_array_equal(np.asarray(got[p]), want, err_msg=p)


def test_import_error_paths(corpus, tmp_path):
    from controllable_xgating_tpu.models.captioner import init_captioner
    from controllable_xgating_tpu.utils.config import load_config
    from controllable_xgating_tpu.cli.common import load_corpus

    cfg = load_config(None, {f"model.{k}": v for k, v in SMALL.items()})
    info, labels, store, cfg = load_corpus(corpus, cfg)
    template = init_captioner(jax.random.PRNGKey(0), cfg.model)
    names = [n for n, _ in itc.param_paths(template)]
    leaf = dict(itc.param_paths(template))[names[0]]

    with pytest.raises(ValueError, match="unknown parameter paths"):
        itc.import_params(template, {}, {"not.a.path": "x"})
    with pytest.raises(KeyError, match="not in the checkpoint"):
        itc.import_params(template, {}, {names[0]: "missing_key"},
                          allow_missing=True)
    sd = {"k": torch.tensor(np.zeros((3, 3), np.float32))}
    if np.asarray(leaf).shape != (3, 3):
        with pytest.raises(ValueError, match="shape"):
            itc.import_params(template, sd, {names[0]: "k"},
                              allow_missing=True)
    with pytest.raises(ValueError, match="unmapped"):
        itc.import_params(template, sd, {})
    # partial import keeps init values
    params, rep = itc.import_params(template, {}, {}, allow_missing=True)
    assert rep["imported"] == [] and len(rep["kept_initialized"]) == len(names)


def test_pickle_code_is_rejected_without_optin(tmp_path):
    """A .pth whose wrapper pickles arbitrary objects must NOT be unpickled
    by default (pickle executes code); it loads only under --unsafe_pickle
    (ADVICE r2, medium)."""

    pth = str(tmp_path / "wrapped.pth")
    # a pickled function reference: benign here, but exactly the shape of
    # object whose unpickling can execute arbitrary code (reduce payloads)
    torch.save(
        {"state_dict": {"w": torch.zeros(2)}, "infos": os.getcwd}, pth
    )
    with pytest.raises(ValueError, match="unsafe_pickle"):
        itc.load_state_dict(pth)
    sd = itc.load_state_dict(pth, unsafe_pickle=True)
    assert set(sd) == {"w"}

    # a plain tensor-only checkpoint loads fine without the flag
    plain = str(tmp_path / "plain.pth")
    torch.save({"state_dict": {"w": torch.ones(3)}}, plain)
    sd = itc.load_state_dict(plain)
    assert set(sd) == {"w"}
