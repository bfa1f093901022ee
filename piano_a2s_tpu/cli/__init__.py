"""Command-line entry points (installed as console scripts; the repo-root
scripts of the same names are thin launchers kept for the reference's
`python pretrain.py ...` surface, reference: README.md:116-132)."""
