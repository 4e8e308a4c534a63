"""Compat aliases for abacusnbody.hod.zcv."""
