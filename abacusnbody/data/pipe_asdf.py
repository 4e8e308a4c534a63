"""Compat alias for abacusnbody.data.pipe_asdf (same wire format)."""

from abacusutils_tpu.io.pipe_asdf import main, unpack_to_pipe  # noqa: F401

if __name__ == '__main__':
    main()
