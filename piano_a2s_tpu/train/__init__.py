"""Training / evaluation harness (replaces the reference's SpeechBrain
dependency): losses, optimizer steps, NewBob scheduling, WER/F1 metrics,
checkpointing, logging, and the fit/evaluate loops."""
