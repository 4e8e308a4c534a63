"""Compat alias for abacusnbody.hod.prepare_sim (CLI-compatible)."""

from abacusutils_tpu.models.hod.prepare_sim import main  # noqa: F401

if __name__ == '__main__':
    main()
