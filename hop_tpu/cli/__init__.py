"""Entry points mirroring the reference's run_ted.py / run_expressive.py /
test_checkpoint.py."""
