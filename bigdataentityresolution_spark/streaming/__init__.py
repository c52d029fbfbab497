"""Structured Streaming extensions.

The reference is batch-only (SURVEY.md §2.11 — no watermarks, windows,
or stateful operators anywhere in the C source). These modules are new
engine capability for continuous ingest of the same relations the batch
operators consume.
"""
