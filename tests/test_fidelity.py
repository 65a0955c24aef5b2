"""Reference-surface fidelity: in-run XE->SCST switch, UNK blocking."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from controllable_xgating_tpu.cli import prepro as cli_prepro
from controllable_xgating_tpu.cli import train as cli_train

SMALL = [
    "--model.hidden_dim", "16", "--model.embed_dim", "10",
    "--model.attn_dim", "10", "--model.pos_embed_dim", "10",
    "--model.num_frames", "4", "--model.dropout", "0.0",
    "--data.batch_size", "5", "--data.caps_per_video_train", "2",
    "--train.lr", "1e-3", "--train.log_every_steps", "1000",
    "--eval.max_decode_len", "10",
]


@pytest.mark.slow
def test_scst_start_epoch_switch(tmp_path):
    """The reference's single-run XE->SCST switch (scst_start_epoch)."""
    d = str(tmp_path / "corpus")
    cli_prepro.main([
        "--out", d, "--fixtures", "--fixture_videos", "10",
        "--fixture_frames", "4", "--fixture_app_dim", "12",
        "--fixture_motion_dim", "8", "--max_caption_len", "10",
        "--seqs_per_video", "4",
    ])
    ck = str(tmp_path / "ck")
    cli_train.main([
        "--data_dir", d, "--checkpoint_dir", ck,
        "--stage", "joint", "--epochs", "2",
        "--train.scst_start_epoch", "1", *SMALL,
    ])
    import json, os
    assert os.path.exists(ck + "/joint/last.infos.json")
    infos = json.load(open(ck + "/joint/last.infos.json"))
    assert infos["stage"] == "scst"  # second phase wrote last


def test_block_unk_masks_unk():
    from controllable_xgating_tpu.data.vocab import UNK
    from controllable_xgating_tpu.infer.greedy import mask_special_tokens

    logits = jnp.zeros((2, 10))
    out = mask_special_tokens(logits, block_unk=True)
    assert float(out[0, UNK]) < -1e29
    out2 = mask_special_tokens(logits, block_unk=False)
    assert float(out2[0, UNK]) == 0.0


@pytest.mark.slow
def test_block_unk_beam_never_emits_unk():
    from controllable_xgating_tpu.data.vocab import UNK
    from controllable_xgating_tpu.infer.beam import beam_search
    from controllable_xgating_tpu.models.captioner import (
        encode_for_inference, init_captioner,
    )
    from controllable_xgating_tpu.utils.config import ModelConfig

    cfg = ModelConfig(
        app_dim=10, motion_dim=8, hidden_dim=12, embed_dim=8, attn_dim=10,
        pos_embed_dim=10, vocab_size=20, pos_vocab_size=12, num_frames=4,
        max_caption_len=8, max_pos_len=8,
    )
    # bias the model toward UNK so blocking is actually exercised
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    params = params.replace(
        decoder=params.decoder.replace(
            b_out=params.decoder.b_out.at[UNK].set(50.0)
        )
    )
    key = jax.random.PRNGKey(1)
    app = jax.random.normal(key, (3, 4, 10))
    mot = jax.random.normal(key, (3, 4, 8))
    ctx, summary, _ = encode_for_inference(params, app, mot, max_pos_len=6)
    t_unblocked, _ = beam_search(params.decoder, ctx, summary, 3, 8)
    assert (np.asarray(t_unblocked) == UNK).any()
    t_blocked, _ = beam_search(
        params.decoder, ctx, summary, 3, 8, block_unk=True
    )
    assert not (np.asarray(t_blocked) == UNK).any()
