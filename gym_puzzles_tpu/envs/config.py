"""Per-variant static configuration.

Every magic constant of the reference envs, lifted into frozen dataclasses
(reference: multi_robot_puzzle_00.py:38-88, multi_robot_puzzle_02.py:39-82,
core.py:16-37, robot.py:7-14, blocks.py:11-15).  These are compile-time
constants: a variant's config is hashable and baked into its jitted program.

Mutable-through-methods state of the reference (``set_reward_params``,
``update_params``, ``update_goal``, 00.py:231-246) becomes the *dynamic*
:class:`RewardParams` pytree, passed into the jitted step so trainers can
anneal it without recompiling.
"""

from __future__ import annotations

import dataclasses

import numpy as np
from flax import struct

# Shared physics rate (00.py:39, 02.py:39, core.py:16)
FPS = 50
DT = 1.0 / FPS
VELOCITY_ITERS = 6 * 30  # world.Step(dt, 6*30, 2*30) everywhere
POSITION_ITERS = 2 * 30

# v0 constants (00.py:38-67)
V0_SCALE = 30.0
V0_VIEWPORT_W, V0_VIEWPORT_H = 640, 480
V0_BORDER = 1.0
V0_FR = 0.999
V0_DAMP = 5.0
V0_DENSE = 5.0
V0_SPEED = 10.0 / V0_SCALE * 4.0  # 4/3 m/s
V0_EPSILON = 25.0
V0_BLOCK_REWARD = 10.0
V0_FINAL_REWARD = 10000.0
V0_AGENT_POLY = np.array(
    [
        (-0.25, -0.75), (0.25, -0.75), (0.75, -0.25), (0.75, 0.25),
        (0.25, 0.75), (-0.25, 0.75), (-0.75, 0.25), (-0.75, -0.25),
    ]
)  # AGENT_POLY with S=2 (00.py:62-67)

# v2 constants (02.py:39-67)
V2_SCALE = 140.0 * 4
V2_VIEWPORT_W, V2_VIEWPORT_H = 1440, 810
V2_BORDER = 0.3
V2_BOUNDS = 0.1
V2_FR = 0.01
V2_LINEAR_DAMP = 5.0
V2_ANG_DAMP = 5.0
V2_BLK_DENSE = 1.56
V2_HEAVY_BLK_DENSE = 20.0  # (02.py:162-165)
V2_AGT_DENSE = 17.3
V2_FORCE = 0.75
V2_EPSILON = 0.1
V2_RATIO = V2_SCALE / V2_VIEWPORT_W
V2_AGENT_POLY = np.array(
    [
        (-0.039, -0.095), (0.039, -0.095), (0.095, -0.039), (0.095, 0.039),
        (0.039, 0.095), (-0.039, 0.095), (-0.095, 0.039), (-0.095, -0.039),
    ]
)

# v3 constants (core.py:16-37, robot.py, blocks.py)
V3_SCALE = 30.0
V3_SCREEN_W, V3_SCREEN_H = 640, 480
V3_BORDER = 1.0
V3_EPSILON = 25.0
V3_BLOCK_FR = 2.5  # blocks.py:12
V3_BLOCK_DAMP = 5.0
V3_AGENT_SCALE = 8.0  # core.py:241
V3_AGENT_DENSITY = 5.0
V3_AGENT_MAX_SPEED = 5.0  # core.py:240
V3_AGENT_FR = 0.2  # robot.py:37-40 sets no friction -> Box2D default
V3_DENSE = 5.0

DEFAULT_FRICTION = 0.2  # Box2D default where the reference sets none


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Static env variant description (hashable; jit static arg)."""

    env_id: str
    variant: str  # 'v0' | 'v2' | 'v3'
    num_agents: int
    heavy: bool
    obs_dim: int
    act_dim: int
    max_episode_steps: int
    reward_threshold: float
    frameskip: int = 1
    dt: float = DT
    velocity_iters: int = VELOCITY_ITERS
    position_iters: int = POSITION_ITERS
    # Block shape 't' | 'l' | 'i' (the reference Block entity's
    # BLOCK_OPTIONS, blocks.py:15,80-109; v0 carries the same L/I fixture
    # recipes in its multi-block scaffolding, 00.py:320-351).  Every
    # registered env id uses 't' (core.py:224, 00.py:168); 'l'/'i' are the
    # entity-layer capability exposed through make(..., block_shape=...).
    block_shape: str = "t"
    # statically unroll the solver's pair loops (TPU throughput path: bigger
    # HLO/compile, VMEM-resident fused iterations; see engine/solver.py)
    solver_unroll: bool = False
    # v2 spawn-branch module constants (02.py:61-62): the registered envs
    # run SIMPLE=True (block centered, agents heading 3/2*pi, goal border
    # 0.4) / ANYWHERE=False (agents in the left third).  The dead branches
    # (02.py:304-320,349-360) are part of the file's capability surface and
    # are exposed through make(..., simple=False / anywhere=True).
    v2_simple: bool = True
    v2_anywhere: bool = False


@struct.dataclass
class RewardParams:
    """Dynamic reward/curriculum parameters.

    Defaults mirror ``set_reward_params`` (00.py:231-239, 02.py:216-225,
    core.py:149-155).  ``shaped_*`` are what ``update_params(timestep,
    decay)`` computes (02.py:227-230); the reference *crashes* if v2 reaches
    a done branch before update_params is called (SURVEY quirk #7) -- here
    they default to the undecayed base values instead (flag-gated fix).
    ``scaled_epsilon`` is ``update_goal``'s curriculum output (02.py:232-233).
    """

    weight_delta_agent: object
    weight_agent_dist: object
    weight_delta_block: object
    weight_blk_dist: object
    puzzle_complete_reward: object
    out_of_bounds_penalty: object
    blk_out_of_bounds_penalty: object
    shaped_bounds_penalty: object
    shaped_blk_bounds_penalty: object
    shaped_puzzle_reward: object
    scaled_epsilon: object

    @staticmethod
    def default(variant: str) -> "RewardParams":
        # numpy leaves, deliberately: these params are closed over by jitted
        # step functions, and numpy constants embed as HLO literals.  A
        # captured *device* array becomes a runtime-bound executable
        # parameter, which on the tunneled TPU stalls every execution
        # (~200ms/call, measured) -- see README performance notes.
        f = lambda x: np.float32(x)
        if variant == "v0":
            w = dict(agent_delta=10.0, agent_dist=0.1, block_delta=50.0, block_dist=0.025,
                     comp=10000.0, oob=1000.0, blk_oob=100.0, eps=V0_EPSILON)
        elif variant == "v2":
            w = dict(agent_delta=10.0, agent_dist=0.25, block_delta=25.0, block_dist=0.1,
                     comp=10000.0, oob=1000.0, blk_oob=100.0, eps=V2_EPSILON)
        elif variant == "v3":
            w = dict(agent_delta=10.0, agent_dist=0.1, block_delta=50.0, block_dist=0.025,
                     comp=100.0, oob=1000.0, blk_oob=100.0, eps=V3_EPSILON)
        else:
            raise ValueError(variant)
        return RewardParams(
            weight_delta_agent=f(w["agent_delta"]),
            weight_agent_dist=f(w["agent_dist"]),
            weight_delta_block=f(w["block_delta"]),
            weight_blk_dist=f(w["block_dist"]),
            puzzle_complete_reward=f(w["comp"]),
            out_of_bounds_penalty=f(w["oob"]),
            blk_out_of_bounds_penalty=f(w["blk_oob"]),
            shaped_bounds_penalty=f(w["oob"]),
            shaped_blk_bounds_penalty=f(w["blk_oob"]),
            shaped_puzzle_reward=f(w["comp"]),
            scaled_epsilon=f(w["eps"]),
        )

    # Reference set_reward_params kwarg name -> RewardParams field
    # (00.py:231-239, 02.py:216-225, core.py:149-155).
    REFERENCE_WEIGHT_NAMES = {
        "agentDelta": "weight_delta_agent",
        "agentDistance": "weight_agent_dist",
        "blockDelta": "weight_delta_block",
        "blockDistance": "weight_blk_dist",
        "puzzleComp": "puzzle_complete_reward",
        "outOfBounds": "out_of_bounds_penalty",
        "blkOutOfBounds": "blk_out_of_bounds_penalty",
    }

    def set_reward_params(self, **kw):
        """Reference ``set_reward_params`` (00.py:231-239): override reward
        weights by their reference kwarg names.  The three base
        penalties/rewards also reset their ``shaped_*`` copies (the
        reference's update_params recomputes shaped values from the bases,
        02.py:227-230; until it runs, shaped == base here -- the
        flag-gated quirk-#7 fix).

        These are LIVE v0 surfaces: the four weight_* fields are consumed
        every step by the v0 reward (00.py:480-492), which is what makes a
        reward-weight curriculum possible inside the reference's own
        capability envelope (puzzleComp, by contrast, is dead in v0 --
        completion pays the constant FINAL_REWARD, 00.py:515-517).

        numpy leaves (not jnp) for the same closure-capture reason as
        :meth:`default`."""
        repl = {}
        for name, value in kw.items():
            field = self.REFERENCE_WEIGHT_NAMES.get(name, name)
            if field not in {f.name for f in dataclasses.fields(self)}:
                raise TypeError(f"unknown reward param {name!r}")
            repl[field] = np.float32(value)
        for base, shaped in (
            ("out_of_bounds_penalty", "shaped_bounds_penalty"),
            ("blk_out_of_bounds_penalty", "shaped_blk_bounds_penalty"),
            ("puzzle_complete_reward", "shaped_puzzle_reward"),
        ):
            if base in repl and shaped not in repl:
                repl[shaped] = repl[base]
        return self.replace(**repl)

    def update_params(self, timestep, decay):
        """Reference ``update_params`` (00.py:241-243, 02.py:227-230): shaped
        penalties/rewards scaled by decay**(-timestep)."""
        import jax.numpy as jnp

        k = jnp.asarray(decay, jnp.float32) ** (-jnp.asarray(timestep, jnp.float32))
        return self.replace(
            shaped_bounds_penalty=self.out_of_bounds_penalty * k,
            shaped_blk_bounds_penalty=self.blk_out_of_bounds_penalty * k,
            shaped_puzzle_reward=self.puzzle_complete_reward * k,
        )

    def update_goal(self, epoch, nb_epochs, base_epsilon):
        """Reference ``update_goal`` (00.py:245-246): epsilon curriculum."""
        import jax.numpy as jnp

        e = jnp.asarray(epoch, jnp.float32) / jnp.asarray(nb_epochs, jnp.float32)
        return self.replace(scaled_epsilon=jnp.asarray(base_epsilon, jnp.float32) * (2.0 - e))


# Registered variants (gym_puzzles/__init__.py:3-36; dims are the empirical
# anchors from SURVEY.md §8.14).
VARIANTS = {
    "MultiRobotPuzzle-v0": EnvConfig(
        env_id="MultiRobotPuzzle-v0", variant="v0", num_agents=2, heavy=False,
        obs_dim=28, act_dim=6, max_episode_steps=2000, reward_threshold=500.0,
    ),
    "MultiRobotPuzzleHeavy-v0": EnvConfig(
        env_id="MultiRobotPuzzleHeavy-v0", variant="v0", num_agents=5, heavy=True,
        obs_dim=40, act_dim=15, max_episode_steps=3000, reward_threshold=500.0,
    ),
    "MultiRobotPuzzle-v2": EnvConfig(
        env_id="MultiRobotPuzzle-v2", variant="v2", num_agents=2, heavy=False,
        obs_dim=39, act_dim=4, max_episode_steps=2000, reward_threshold=500.0,
    ),
    "MultiRobotPuzzleHeavy-v2": EnvConfig(
        env_id="MultiRobotPuzzleHeavy-v2", variant="v2", num_agents=2, heavy=True,
        obs_dim=39, act_dim=4, max_episode_steps=2000, reward_threshold=500.0,
    ),
    "MultiRobotPuzzle-v3": EnvConfig(
        env_id="MultiRobotPuzzle-v3", variant="v3", num_agents=2, heavy=False,
        obs_dim=27, act_dim=6, max_episode_steps=1500, reward_threshold=110.0,
    ),
}
