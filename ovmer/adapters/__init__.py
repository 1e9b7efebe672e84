"""Worked adapters wrapping third-party MLLMs for the OV-MER zero-shot
harness (`ovmer.zero_shot_harness.run_zero_shot`)."""
