from .sharding import make_scenario_mesh, sharded_mpc_step, sharded_solve
