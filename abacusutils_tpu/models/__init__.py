from . import hod
