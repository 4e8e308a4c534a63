from .asdf_file import AsdfFile, open_asdf, write_asdf, set_nthreads
from .table import Table
