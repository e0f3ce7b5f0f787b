"""Test doubles for the connector layer (no cloud credentials in CI)."""
