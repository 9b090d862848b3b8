"""On-chip A/B of solver_pallas.POS_TRIG_INCREMENTAL via the headline bench.

Usage: python docs/benchmarks/bench_pos_trig.py [on|off] [num_envs]
"""
import sys

import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import gym_puzzles_tpu.engine.solver_pallas as slp

slp.POS_TRIG_INCREMENTAL = (sys.argv[1] if len(sys.argv) > 1 else "on") == "on"
num_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

import bench

print(f"# POS_TRIG_INCREMENTAL={slp.POS_TRIG_INCREMENTAL}", file=sys.stderr)
bench.main(num_envs=num_envs)
