"""CLI entry points for the ait_tpu framework."""
