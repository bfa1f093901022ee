"""Mesh-sharded (multi-chip) serving path of the Transcriber on the
virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from piano_a2s_tpu.infer import Transcriber
from piano_a2s_tpu.models import ModelConfig, init_params, init_state
from piano_a2s_tpu.ops.vqt import VQTConfig

CFG = ModelConfig(freq_bins=12, conv_feature_size=16, hidden_size=16,
                  max_bars=2, max_length=(8, 6), note_emb_size=8,
                  staff_emb_size=8)
VQT = VQTConfig(bins_per_octave=3, n_octaves=4, window_size=1024,
                sample_rate=16000, hop_length=160)


def test_mesh_transcriber_matches_single_device():
    params = init_params(jax.random.PRNGKey(0), CFG)
    for d in ("upper", "lower"):
        b = np.array(params["decoder"][d]["out"]["b"])
        b[CFG.eos] += 5.0
        params["decoder"][d]["out"]["b"] = jnp.asarray(b)
    state = init_state(CFG)
    single = Transcriber(params, state, CFG, VQT, max_frame_num=101)
    meshy = Transcriber(params, state, CFG, VQT, max_frame_num=101,
                        use_mesh=True)
    assert meshy.mesh.devices.size == 8
    rng = np.random.RandomState(0)
    clips = [0.1 * rng.randn(12000).astype(np.float32) for _ in range(3)]
    a = single.transcribe_batch(clips)
    b = meshy.transcribe_batch(clips)  # padded to 8 across the mesh
    assert a == b

    # The pipelined stream also serves over the mesh (batch_size must
    # divide the mesh) and yields the same results.
    c = list(meshy.transcribe_stream(clips, batch_size=8, depth=2))
    assert c == a
    # non-divisible batch size is rejected at CALL time (no next() needed)
    import pytest
    with pytest.raises(ValueError):
        meshy.transcribe_stream(clips, batch_size=3)


def test_mesh_chunked_decode_matches_unchunked():
    """The shard_map'd mesh forward composes with the chunked decode:
    batch 32 over 8 devices -> local shard 4, decode_chunk=2 ACTIVATES
    the lax.map chunk path inside the shard_map body (decode_chunk=1
    would resolve to None — pick_decode_chunk never chunks below 2),
    and results equal the mesh run with chunking disabled on this
    EOS-confident model."""
    from piano_a2s_tpu.models.score_transcription import pick_decode_chunk
    params = init_params(jax.random.PRNGKey(1), CFG)
    for d in ("upper", "lower"):
        b = np.array(params["decoder"][d]["out"]["b"])
        b[CFG.eos] += 5.0
        params["decoder"][d]["out"]["b"] = jnp.asarray(b)
    state = init_state(CFG)
    kw = dict(cfg=CFG, vqt_cfg=VQT, max_frame_num=101, use_mesh=True)
    assert pick_decode_chunk(2, 4) == 2  # the local-shard resolution
    chunked = Transcriber(params, state, decode_chunk=2, **kw)
    plain = Transcriber(params, state, decode_chunk=None, **kw)
    rng = np.random.RandomState(1)
    clips = [0.1 * rng.randn(12000).astype(np.float32) for _ in range(32)]
    a = chunked.transcribe_batch(clips)
    b = plain.transcribe_batch(clips)
    assert a == b
