"""Operator library: every relational/dataflow op from SURVEY.md §2.

All operators are thin, tested policies over the public DataFrame API —
they exist to (a) name the capability, (b) encode the scale-aware default
(broadcast hints, partial aggs, shuffle bounds), and (c) give the test
suite a stable surface. Zero custom Catalyst.
"""
