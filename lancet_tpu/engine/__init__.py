"""Oracle engine: exact host-side implementation of the reference semantics.

Defines correctness for the TPU engine (every kernel is validated against
this) and serves as the fallback path for irregular windows.
"""
