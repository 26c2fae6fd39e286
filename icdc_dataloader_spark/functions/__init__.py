"""Scalar / vectorized function library (SURVEY.md §2.8).

Native Catalyst expressions for the hot path; pandas/Arrow UDFs where exact
bit-parity with the reference's Python semantics is required. No row-at-a-time
Python UDFs anywhere.
"""
