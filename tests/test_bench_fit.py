"""bench.measure_train_fit smoke: the end-to-end Trainer.fit bench config
runs (fixture generation, fit, epoch_time parsing) at toy sizes on CPU."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_measure_train_fit_small():
    import bench
    clips_per_sec = bench.measure_train_fit(
        epochs=2, n_train=4, batch_size=2, accum_steps=2,
        exp_kwargs=dict(max_length=(8, 6), max_duration=1,
                        frames_per_second=23, bins_per_octave=4,
                        n_octaves=4, conv_feature_size=16, hidden_size=16,
                        note_emb_size=8, staff_emb_size=8),
        spec_shape=(22, 16))
    assert clips_per_sec > 0
