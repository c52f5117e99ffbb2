"""Relational restatements of the reference's per-request pipeline stages.

SURVEY.md §2 operator inventory: F* filter/frontier ops, S* scheduling ops,
X* fetch ops, P* parse ops, E* error taps — each implemented as DataFrame
transformations + Arrow-vectorized pandas UDFs (never per-row Python through
the JVM boundary).
"""
