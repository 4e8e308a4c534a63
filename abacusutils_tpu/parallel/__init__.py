from .mesh import make_mesh, shard_particles, sharded_hod_pk
