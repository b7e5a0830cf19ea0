"""Parity pipeline: bronze ingest → silver derive + quality split → sinks."""
