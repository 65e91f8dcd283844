"""Scene composition (reference tests/test_scene.py): multi-entity
attach with prefixes, env-origin grid, lookup."""

import jax
import mujoco
import numpy as np
import pytest

from mjlab_tpu.entity.entity import EntityCfg
from mjlab_tpu.scene.scene import Scene, SceneCfg


def _ball(name_pos):
    def fn():
        return mujoco.MjSpec.from_string(
            f"""
<mujoco>
  <worldbody>
    <body name="b" pos="0 0 {name_pos}">
      <freejoint name="f"/>
      <geom name="g" type="sphere" size="0.1" mass="1"/>
    </body>
  </worldbody>
</mujoco>
"""
        )

    return fn


@pytest.fixture(scope="module")
def scene():
    cfg = SceneCfg(
        num_envs=4,
        env_spacing=2.0,
        entities={"a": EntityCfg(spec_fn=_ball(0.5)),
                  "b": EntityCfg(spec_fn=_ball(1.5))},
    )
    s = Scene(cfg)
    s.compile()
    return s


def test_entities_attached_with_prefix(scene):
    model = scene.compile()
    names = [
        mujoco.mj_id2name(model, mujoco.mjtObj.mjOBJ_BODY, i)
        for i in range(model.nbody)
    ]
    assert "a/b" in names and "b/b" in names


def test_lookup(scene):
    assert scene["a"] is not scene["b"]
    with pytest.raises(KeyError):
        scene["missing"]


def test_env_origins_grid(scene):
    o = np.asarray(scene.env_origins)
    assert o.shape == (4, 3)
    # 2x2 grid at 2m spacing, centered
    d = np.linalg.norm(o[:, None] - o[None, :], axis=-1)
    assert d[np.triu_indices(4, 1)].min() >= 2.0 - 1e-6
    np.testing.assert_allclose(o.mean(axis=0), [0, 0, 0], atol=1e-6)


def test_merged_init_keyframe(scene):
    model = scene.compile()
    names = [model.key(i).name for i in range(model.nkey)]
    assert any("init_state" in n for n in names), names
