"""Compat aliases for abacusnbody.analysis."""
