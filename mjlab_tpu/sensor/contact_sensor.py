"""Contact sensor: per-match contact aggregates computed directly from the
static contact-slot table, plus the air/contact-time state machine.

TPU-native replacement for the reference's MuJoCo mjSENS_CONTACT sensors
(reference src/mjlab/sensor/contact_sensor.py:50-533): instead of CUDA
sensor kernels with data-bit encoding and slot matching, each primary match
object resolves at startup to a static list of contact slots in the pair
table; runtime reduction is a masked segment reduce inside the jitted step.

One sensor ROW per matched primary object: mode="geom" -> each matched geom;
mode="body" -> each matched body (all its geoms); mode="subtree" -> each
matched body's whole subtree. ``secondary`` filters the other geom of the
contact (None = anything outside the primary object).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Literal

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu.sensor.sensor import Sensor, SensorCfg
from mjlab_tpu.utils.struct import pytree


@dataclass
class ContactMatch:
    mode: Literal["geom", "body", "subtree"] = "geom"
    pattern: str = ".*"
    entity: str | None = None
    exclude: tuple[str, ...] = ()


@dataclass(kw_only=True)
class ContactSensorCfg(SensorCfg):
    name: str = ""
    primary: ContactMatch = None
    secondary: ContactMatch | None = None
    fields: tuple[str, ...] = ("found",)
    reduce: Literal["none", "netforce", "maxforce", "mindist"] = "netforce"
    num_slots: int = 1
    track_air_time: bool = False
    global_frame: bool = True

    def build(self, scene):
        return ContactSensor(self, scene)


@pytree
class ContactSensorState:
    current_air_time: jax.Array  # (E, M)
    current_contact_time: jax.Array
    last_air_time: jax.Array
    last_contact_time: jax.Array


@pytree
class ContactData:
    found: jax.Array  # (E, M) bool
    force: jax.Array  # (E, M, 3) net contact force on the primary (world)
    dist: jax.Array  # (E, M) min distance (+inf when no contact)
    normal: jax.Array  # (E, M, 3) normal of the deepest slot
    current_air_time: jax.Array | None = None
    current_contact_time: jax.Array | None = None
    last_air_time: jax.Array | None = None
    last_contact_time: jax.Array | None = None


def _subtree_bodies(mj_model, root: int) -> list[int]:
    out, stack = [], [root]
    while stack:
        b = stack.pop()
        out.append(b)
        for c in range(mj_model.nbody):
            if c != b and int(mj_model.body_parentid[c]) == b:
                stack.append(c)
    return out


def _resolve_objects(mj_model, match: ContactMatch) -> list[tuple[str, set]]:
    """-> [(object local name, set of global geom ids)] per primary match."""
    prefix = f"{match.entity}/" if match.entity else ""

    def local(name):
        if prefix:
            return name[len(prefix):] if name.startswith(prefix) else None
        return name

    geom_names = [
        mujoco.mj_id2name(mj_model, mujoco.mjtObj.mjOBJ_GEOM, g) or ""
        for g in range(mj_model.ngeom)
    ]
    body_names = [
        mujoco.mj_id2name(mj_model, mujoco.mjtObj.mjOBJ_BODY, b) or ""
        for b in range(mj_model.nbody)
    ]

    def excluded(ln):
        return any(re.fullmatch(e, ln) for e in match.exclude)

    objs = []
    if match.mode == "geom":
        for g, n in enumerate(geom_names):
            ln = local(n)
            if ln is not None and re.fullmatch(match.pattern, ln) and not excluded(ln):
                objs.append((ln, {g}))
        return objs

    matched_bodies = []
    for b, n in enumerate(body_names):
        ln = local(n)
        if ln is not None and re.fullmatch(match.pattern, ln) and not excluded(ln):
            matched_bodies.append((ln, b))
    for ln, b in matched_bodies:
        bodies = _subtree_bodies(mj_model, b) if match.mode == "subtree" else [b]
        bset = set(bodies)
        geoms = {
            g for g in range(mj_model.ngeom)
            if int(mj_model.geom_bodyid[g]) in bset
        }
        objs.append((ln, geoms))
    return objs


def pyramid_to_force(dim: int, mu: jax.Array, rows: jax.Array) -> jax.Array:
    """Contact-frame force from pyramid edge forces (mj_contactForce):
    f_normal = sum(rows); f_k = mu_k * (rows[2k] - rows[2k+1])."""
    if dim == 1:
        return rows[..., :1]
    fn = jnp.sum(rows, axis=-1, keepdims=True)
    fk = [
        (mu[..., k] * (rows[..., 2 * k] - rows[..., 2 * k + 1]))[..., None]
        for k in range(dim - 1)
    ]
    return jnp.concatenate([fn] + fk, axis=-1)


class ContactSensor(Sensor):
    def __init__(self, cfg: ContactSensorCfg, scene):
        super().__init__(scene)
        self.cfg = cfg
        if cfg.name:
            self.name = cfg.name
        self.match_names: list[str] = []

    def initialize(self, mj_model, num_envs, rng, ctx) -> None:
        self.ctx = ctx
        pt = ctx.model.pairs
        primaries = _resolve_objects(mj_model, self.cfg.primary)
        if self.cfg.secondary is not None:
            sec: set | None = set()
            for _, gs in _resolve_objects(mj_model, self.cfg.secondary):
                sec |= gs
        else:
            sec = None

        slot_lists = []
        names = []
        for oname, pset in primaries:
            slots, signs = [], []
            for c in range(pt.ncon):
                g1, g2 = int(pt.con_geom1[c]), int(pt.con_geom2[c])
                in1, in2 = g1 in pset, g2 in pset
                if not (in1 or in2):
                    continue
                if in1 and in2:
                    continue  # both geoms inside the object: not a contact with it
                other = g2 if in1 else g1
                if sec is not None and other not in sec:
                    continue
                slots.append(c)
                signs.append(1.0 if in2 else -1.0)
            slot_lists.append((np.array(slots, np.int32), np.array(signs, np.float32)))
            names.append(oname)

        # self-collision case: primary set == secondary set -> the per-object
        # loop above already restricts 'other' to the secondary set; contacts
        # fully inside one object were skipped, so intra-entity pairs between
        # DIFFERENT objects are captured when objects overlap sets.
        self.match_names = names
        self.num_matches = max(len(slot_lists), 1)
        max_slots = max([len(s) for s, _ in slot_lists] or [0])
        max_slots = max(max_slots, 1)
        M = self.num_matches
        slot_table = np.zeros((M, max_slots), np.int32)
        slot_mask = np.zeros((M, max_slots), bool)
        sign = np.zeros((M, max_slots), np.float32)
        for i, (slots, signs) in enumerate(slot_lists):
            slot_table[i, : len(slots)] = slots
            slot_mask[i, : len(slots)] = True
            sign[i, : len(slots)] = signs
        self.slot_table = slot_table
        self.slot_mask = slot_mask
        self.slot_sign = sign

        if self.cfg.track_air_time:
            z = jnp.zeros((num_envs, M), jnp.float32)
            ctx.sensor_states[self.name] = ContactSensorState(
                current_air_time=z,
                current_contact_time=z,
                last_air_time=z,
                last_contact_time=z,
            )

    def find_matches(self, exprs):
        from mjlab_tpu.utils.string import resolve_matching_names

        return resolve_matching_names(list(exprs), self.match_names)

    # -- runtime --

    def _compute(self, ctx) -> ContactData:
        d = ctx.data
        st = self.slot_table  # (M, S)
        active = (d.contact.dist < d.contact.includemargin)[:, st] & self.slot_mask
        dist = jnp.where(active, d.contact.dist[:, st], jnp.inf)
        found = jnp.any(active, axis=-1)

        M, S = st.shape
        # world forces are stored COMPACTED by the solver (d.con_force_c
        # per selected slot, force on geom2); expand onto this sensor's
        # static slot table with a one-hot sum over the K compacted slots
        # (K is small — cheaper than scattering to the full slot table),
        # flipping sign so force is ON the primary object
        sgn = jnp.asarray(self.slot_sign)  # (M, S)
        sel = d.con_sel  # (E, K)
        onehot = (
            sel[:, None, None, :] == jnp.asarray(st)[None, :, :, None]
        ).astype(d.con_force_c.dtype)  # (E, M, S, K)
        force_w = (
            jnp.einsum("emsk,ekx->emsx", onehot, d.con_force_c)
            * sgn[None, :, :, None]
        )
        net_force = jnp.sum(force_w, axis=2)

        deepest = jnp.argmin(dist, axis=-1)
        slot_of = jnp.asarray(st)[jnp.arange(M)[None], deepest]
        normal = jnp.take_along_axis(
            d.contact.frame[:, :, 0, :], slot_of[..., None], axis=1
        )

        data = ContactData(
            found=found,
            force=net_force,
            dist=jnp.min(dist, axis=-1),
            normal=normal,
        )
        if self.cfg.track_air_time and self.name in ctx.sensor_states:
            s = ctx.sensor_states[self.name]
            data = data.replace(
                current_air_time=s.current_air_time,
                current_contact_time=s.current_contact_time,
                last_air_time=s.last_air_time,
                last_contact_time=s.last_contact_time,
            )
        return data

    @property
    def data(self) -> ContactData:
        return self._compute(self.ctx)

    def update(self, ctx, dt: float) -> None:
        if not self.cfg.track_air_time:
            return
        s = ctx.sensor_states[self.name]
        found = self._compute(ctx).found
        became_contact = found & (s.current_air_time > 0)
        became_air = ~found & (s.current_contact_time > 0)
        last_air = jnp.where(became_contact, s.current_air_time + dt, s.last_air_time)
        last_contact = jnp.where(
            became_air, s.current_contact_time + dt, s.last_contact_time
        )
        cur_air = jnp.where(found, 0.0, s.current_air_time + dt)
        cur_contact = jnp.where(found, s.current_contact_time + dt, 0.0)
        ctx.sensor_states[self.name] = ContactSensorState(
            current_air_time=cur_air,
            current_contact_time=cur_contact,
            last_air_time=last_air,
            last_contact_time=last_contact,
        )

    def compute_first_contact(self, dt: float) -> jax.Array:
        s = self.ctx.sensor_states[self.name]
        found = self._compute(self.ctx).found
        return found & (s.current_contact_time <= dt)

    def compute_first_air(self, dt: float) -> jax.Array:
        s = self.ctx.sensor_states[self.name]
        found = self._compute(self.ctx).found
        return (~found) & (s.current_air_time <= dt)

    def reset(self, ctx, mask) -> None:
        if not self.cfg.track_air_time:
            return
        s = ctx.sensor_states[self.name]
        m = mask[:, None]
        ctx.sensor_states[self.name] = ContactSensorState(
            current_air_time=jnp.where(m, 0.0, s.current_air_time),
            current_contact_time=jnp.where(m, 0.0, s.current_contact_time),
            last_air_time=jnp.where(m, 0.0, s.last_air_time),
            last_contact_time=jnp.where(m, 0.0, s.last_contact_time),
        )
