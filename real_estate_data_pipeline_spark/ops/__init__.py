"""Operator library: pure Column-in/Column-out scalar functions plus
DataFrame-level operators (dedup, similarity, text analysis, quality).
"""
