"""Training-harness component tests: losses vs torch, metrics vs sklearn,
NewBob behavior, Adadelta vs torch, and a sharded train step on the
8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piano_a2s_tpu.train.losses import nll
from piano_a2s_tpu.train.metrics import (
    calculate_f1, calculate_wer, edit_distance, idx2string, macro_f1,
    unpad, word_error_rate)
from piano_a2s_tpu.train.schedulers import (NewBobScheduler,
                                            teacher_forcing_ratio)


def test_nll_matches_torch():
    import torch
    rng = np.random.RandomState(0)
    logits = rng.randn(6, 10, 20).astype(np.float32)
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    targets = rng.randint(0, 20, (6, 10))
    targets[0, :5] = 7  # make sure ignore_index hits something
    t_logp = torch.log_softmax(torch.from_numpy(logits), dim=-1)
    t = torch.nn.NLLLoss()(t_logp.permute(0, 2, 1),
                           torch.from_numpy(targets))
    np.testing.assert_allclose(float(nll(logp, jnp.asarray(targets))),
                               float(t), rtol=1e-6)
    t_ign = torch.nn.NLLLoss(ignore_index=7)(
        t_logp.permute(0, 2, 1), torch.from_numpy(targets))
    np.testing.assert_allclose(
        float(nll(logp, jnp.asarray(targets), ignore_index=7)),
        float(t_ign), rtol=1e-6)


def test_edit_distance_and_wer():
    assert edit_distance("kitten", "sitting") == 3
    assert word_error_rate("a b c d", "a b c d") == 0.0
    assert word_error_rate("a b c d", "a x c") == 0.5  # 1 sub + 1 del
    assert word_error_rate("a \n = \n b", "a \n = \n b") == 0.0


def _naive_levenshtein(ref, hyp):
    """Textbook O(nm) DP — the ground truth the vectorized rows must match."""
    n, m = len(ref), len(hyp)
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + (ref[i - 1] != hyp[j - 1]))
    return d[n][m]


def test_edit_distance_property_vs_naive_dp():
    """The vectorized DP equals the textbook DP on random token strings —
    including repeated tokens, empty sides, and highly-similar pairs."""
    rng = np.random.RandomState(7)
    vocab = [f"t{i}" for i in range(6)]  # small vocab -> many repeats
    for _ in range(200):
        n, m = rng.randint(0, 25), rng.randint(0, 25)
        ref = [vocab[i] for i in rng.randint(0, len(vocab), n)]
        if rng.rand() < 0.5 and n:
            # mutated copy: realistic near-miss hypothesis
            hyp = list(ref)
            for _ in range(rng.randint(0, 4)):
                op = rng.randint(3)
                if op == 1:
                    hyp.insert(rng.randint(len(hyp) + 1),
                               vocab[rng.randint(len(vocab))])
                elif hyp:
                    pos = rng.randint(len(hyp))
                    if op == 0:
                        hyp[pos] = vocab[rng.randint(len(vocab))]
                    else:
                        hyp.pop(pos)
        else:
            hyp = [vocab[i] for i in rng.randint(0, len(vocab), m)]
        assert edit_distance(ref, hyp) == _naive_levenshtein(ref, hyp), \
            (ref, hyp)


def test_wer_jiwer_edge_semantics():
    """Pins word_error_rate to jiwer's documented default-transform
    algorithm (RemoveMultipleSpaces + Strip + split on ' '; WER =
    (S+D+I)/N) on the edges the reference's eval loop can produce
    (reference: pretrain.py:216-227). Each expected value is derived
    from jiwer's documented behavior."""
    # multiple spaces reduce; leading/trailing strip
    assert word_error_rate("a  b   c", "a b c") == 0.0
    assert word_error_rate("  a b  ", "a b") == 0.0
    # non-space whitespace is word content, not a delimiter: the bar-join
    # contributes "\n" and "=" words
    assert word_error_rate("a \n = \n b", "a \n = \n c") == 1 / 5
    # a one-bar clip whose bar decodes empty vs a 3-token hypothesis:
    # jiwer would raise ValueError on the empty reference; we return the
    # insertion count instead (documented divergence in word_error_rate)
    assert word_error_rate("", "x y z") == 3.0
    assert word_error_rate("", "") == 0.0
    assert word_error_rate("   ", "x") == 1.0
    # >=2 bars can never yield an empty reference: the join supplies "="
    empty_bars = " \n = \n ".join(["", ""])
    assert _naive_levenshtein(["\n", "=", "\n"], []) == 3
    assert word_error_rate(empty_bars, "") == 1.0  # 3 deletions / N=3
    # WER above 1.0 (insertion-heavy hypothesis) — jiwer semantics
    assert word_error_rate("a", "a b c d") == 3.0
    # deletion-only: D/N
    assert word_error_rate("a b c d", "") == 1.0


@pytest.mark.skipif(
    __import__("importlib.util", fromlist=["util"]).find_spec("jiwer")
    is None, reason="jiwer not installed")
def test_wer_matches_real_jiwer():
    """If the real jiwer is ever present, cross-check directly (stays
    inside jiwer's defined domain: non-empty references/hypotheses)."""
    import jiwer
    rng = np.random.RandomState(3)
    vocab = ["4", "c", "dd", "8", "r", "\n", "="]
    for _ in range(50):
        ref = " ".join(vocab[i] for i in rng.randint(0, 7, rng.randint(1, 30)))
        hyp = " ".join(vocab[i] for i in rng.randint(0, 7, rng.randint(1, 30)))
        np.testing.assert_allclose(word_error_rate(ref, hyp),
                                   jiwer.wer(ref, hyp), rtol=1e-12)


def test_macro_f1_matches_sklearn():
    from sklearn.metrics import f1_score
    rng = np.random.RandomState(1)
    for _ in range(20):
        y_true = rng.randint(0, 7, 40)
        y_pred = rng.randint(0, 7, 40)
        np.testing.assert_allclose(
            macro_f1(y_true, y_pred),
            f1_score(y_true, y_pred, average="macro"), rtol=1e-9)


def test_calculate_wer_and_f1_shapes():
    pred = {"id1": [[4, 63, 144, 4, 69], [2, 84]]}
    target = {"id1": [[4, 63, 144, 4, 69], [2, 84]]}
    mean_wer, d = calculate_wer(pred, target)
    assert mean_wer == 0.0 and d["id1"] == 0.0
    f1, fd = calculate_f1({"a": [1, 2, 3]}, {"a": [1, 2, 3]})
    assert f1 == 1.0


def test_unpad():
    seq = np.array([5, 6, 146, 9, 146])
    assert unpad(seq).tolist() == [5, 6]
    assert unpad(np.array([5, 6])).tolist() == [5, 6]


def test_idx2string_roundtrip():
    assert idx2string([4, 63]) == "4 c"


def test_newbob_anneals_on_plateau():
    s = NewBobScheduler(initial_value=1.0, annealing_factor=0.8,
                        improvement_threshold=0.0025, patient=0)
    old, new = s(1.0)
    assert (old, new) == (1.0, 1.0)  # first call never anneals
    old, new = s(0.5)  # 50% improvement
    assert new == 1.0
    old, new = s(0.5)  # plateau -> anneal
    assert new == pytest.approx(0.8)
    old, new = s(0.499)  # tiny improvement < threshold -> anneal again
    assert new == pytest.approx(0.64)
    # state round-trips
    s2 = NewBobScheduler(initial_value=1.0)
    s2.load_state_dict(s.state_dict())
    assert s2.hyperparam_value == s.hyperparam_value


def test_teacher_forcing_decay():
    assert teacher_forcing_ratio(0.7, 0.99, 0) == 0.7
    assert teacher_forcing_ratio(0.7, 0.99, 2) == pytest.approx(0.7 * 0.99**2)


def test_adadelta_matches_torch():
    import torch
    from piano_a2s_tpu.train.step import make_optimizer, set_learning_rate
    rng = np.random.RandomState(0)
    w0 = rng.randn(5, 3).astype(np.float32)

    tw = torch.tensor(w0, requires_grad=True)
    topt = torch.optim.Adadelta([tw], lr=1.0, rho=0.95, eps=1e-8)

    opt = make_optimizer(lr=1.0, rho=0.95, eps=1e-8)
    params = {"w": jnp.asarray(w0)}
    opt_state = opt.init(params)

    for step in range(5):
        g = rng.randn(5, 3).astype(np.float32)
        tw.grad = torch.tensor(g)
        topt.step()
        updates, opt_state = opt.update({"w": jnp.asarray(g)}, opt_state,
                                        params)
        import optax
        params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   tw.detach().numpy(), atol=1e-6,
                                   err_msg=f"step {step}")
    # lr change mid-run keeps working
    set_learning_rate(opt_state, 0.8)
    for group in topt.param_groups:
        group["lr"] = 0.8
    g = rng.randn(5, 3).astype(np.float32)
    tw.grad = torch.tensor(g)
    topt.step()
    updates, opt_state = opt.update({"w": jnp.asarray(g)}, opt_state, params)
    import optax
    params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               atol=1e-6)
