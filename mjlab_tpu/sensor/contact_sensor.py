"""Contact sensor: per-match contact aggregates computed directly from the
static contact-slot table, plus the air/contact-time state machine.

TPU-native replacement for the reference's MuJoCo mjSENS_CONTACT sensors
(reference src/mjlab/sensor/contact_sensor.py:50-533): instead of CUDA
sensor kernels with data-bit encoding and slot matching, each primary match
object resolves at startup to a static list of contact slots in the pair
table; runtime reduction is a masked segment reduce inside the jitted step.

Field/reduce surface matches the reference:
  fields: found, force, torque, dist, pos, normal, tangent
  reduce: none | mindist | maxforce | netforce  (top ``num_slots`` rows)
  secondary_policy: first | any | error
  global_frame: force/torque rotated to world (netforce is always world)
Output layout matches the reference: per-field arrays with a
primary-major row axis of size M * num_slots ((E, M*num_slots) scalars,
(E, M*num_slots, 3) vectors); with the default num_slots=1 this is the
familiar per-primary row layout.

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
    secondary_policy: Literal["first", "any", "error"] = "first"
    track_air_time: bool = False
    global_frame: bool = False

    def __post_init__(self):
        bad = set(self.fields) - {
            "found", "force", "torque", "dist", "pos", "normal", "tangent"
        }
        if bad:
            raise ValueError(f"unknown contact sensor fields: {sorted(bad)}")
        if (
            self.global_frame
            and self.reduce != "netforce"
            and {"force", "torque"} & set(self.fields)
            and not {"normal", "tangent"} <= set(self.fields)
        ):
            raise ValueError(
                f"Sensor '{self.name}': global_frame=True requires 'normal' "
                "and 'tangent' in fields"
            )

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
    """Only the requested fields are populated (others None). Row axis is
    primary-major M * num_slots; air-time fields are per-primary (E, M)."""

    found: jax.Array | None = None  # (E, MR) match count before reduction
    force: jax.Array | None = None  # (E, MR, 3)
    torque: jax.Array | None = None  # (E, MR, 3)
    dist: jax.Array | None = None  # (E, MR)
    pos: jax.Array | None = None  # (E, MR, 3) world
    normal: jax.Array | None = None  # (E, MR, 3) world, primary->secondary
    tangent: jax.Array | None = None  # (E, MR, 3) world
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

    patterns = (
        match.pattern if isinstance(match.pattern, (tuple, list))
        else (match.pattern,)
    )

    def matches(ln):
        return any(re.fullmatch(p, ln) for p in patterns)

    def excluded(ln):
        return any(re.fullmatch(e, ln) for e in match.exclude)

    objs = []
    if match.mode == "geom":
        for g, n in enumerate(geom_names):
            ln = local(n)
            if ln is not None and matches(ln) and not excluded(ln):
                objs.append((ln, {g}))
        return objs

    matched_bodies = []
    for b, n in enumerate(body_names):
        ln = local(n)
        if ln is not None and matches(ln) and not excluded(ln):
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
            objs = _resolve_objects(mj_model, self.cfg.secondary)
            if not objs:
                sec: set | None = set()
            elif self.cfg.secondary_policy == "any":
                sec = set().union(*[gs for _, gs in objs])
            elif self.cfg.secondary_policy == "error" and len(objs) > 1:
                raise ValueError(
                    f"Sensor '{self.name}': secondary pattern matched "
                    f"{len(objs)} objects ({[n for n, _ in objs]}) with "
                    "secondary_policy='error'"
                )
            else:  # "first" (or single match)
                sec = objs[0][1]
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

        # inverse map slot id -> flat (m, s) position, for the cheap
        # scatter expansion of compacted solver outputs; falls back to a
        # one-hot matmul when a slot feeds multiple sensor rows.
        ncon = pt.ncon
        slot2flat = np.full(ncon, -1, np.int64) if ncon else np.zeros(0, np.int64)
        self._overlapping = False
        for mm in range(M):
            for s in range(max_slots):
                if not slot_mask[mm, s]:
                    continue
                sid = slot_table[mm, s]
                if slot2flat[sid] != -1:
                    self._overlapping = True
                slot2flat[sid] = mm * max_slots + s
        self._slot2flat = slot2flat

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

    def _expand_compacted(self, d, values):
        """Map compacted per-slot values (E, K, C) onto this sensor's
        static slot table -> (E, M, S, C)."""
        M, S = self.slot_table.shape
        E, K = d.con_sel.shape
        C = values.shape[-1]
        vals = jnp.where(d.con_sel_active[..., None], values, 0.0)
        if not self._overlapping:
            flat = jnp.asarray(self._slot2flat)[d.con_sel]  # (E, K)
            valid = (flat >= 0) & d.con_sel_active
            tgt = jnp.where(valid, flat, M * S)  # overflow dump row
            buf = jnp.zeros((E, M * S + 1, C), values.dtype)
            buf = buf.at[jnp.arange(E)[:, None], tgt].add(vals)
            return buf[:, : M * S].reshape(E, M, S, C)
        onehot = (
            d.con_sel[:, None, None, :]
            == jnp.asarray(self.slot_table)[None, :, :, None]
        ).astype(values.dtype)  # (E, M, S, K)
        out = jnp.einsum("emsk,ekc->emsc", onehot, vals)
        return out * jnp.asarray(self.slot_mask, values.dtype)[None, :, :, None]

    def _compute(self, ctx) -> ContactData:
        cfg = self.cfg
        d = ctx.data
        st = self.slot_table  # (M, S)
        M, S = st.shape
        NR = cfg.num_slots
        active = d.con_found[:, st] & self.slot_mask
        dist = jnp.where(active, d.condist[:, st], jnp.inf)
        E = active.shape[0]
        fields = set(cfg.fields)
        sgn = jnp.asarray(self.slot_sign)  # (M, S)

        need_force = bool(
            {"force", "torque"} & fields
        ) or cfg.reduce == "maxforce"
        force_w = torque_w = None
        if need_force:
            # world force/torque ON the primary object per static slot
            force_w = (
                self._expand_compacted(d, d.con_force_c)
                * sgn[None, :, :, None]
            )  # (E, M, S, 3)
            if "torque" in fields:
                torque_w = (
                    self._expand_compacted(d, d.con_torque_c)
                    * sgn[None, :, :, None]
                )

        found_count = jnp.sum(active, axis=-1)  # (E, M)

        out = ContactData()
        if cfg.reduce == "netforce":
            # single net row per primary, world frame. Sign matches the
            # native mjSENS_CONTACT convention: the force applied BY the
            # primary on the secondary (measured: resting box on a plane
            # reports -mg in z with primary=box).
            if "found" in fields:
                out = out.replace(found=self._tile(found_count, NR))
            if "force" in fields:
                out = out.replace(
                    force=self._tile_vec(-jnp.sum(force_w, axis=2), NR)
                )
            if "torque" in fields:
                out = out.replace(
                    torque=self._tile_vec(-jnp.sum(torque_w, axis=2), NR)
                )
            # netforce zeroes the non-aggregatable fields (measured
            # native-sensor behavior: dist slot reads exactly 0.0)
            if "dist" in fields:
                out = out.replace(
                    dist=jnp.zeros((E, M * NR), dist.dtype)
                )
            if "pos" in fields:
                out = out.replace(pos=jnp.zeros((E, M * NR, 3), dist.dtype))
            if "normal" in fields:
                out = out.replace(normal=jnp.zeros((E, M * NR, 3), dist.dtype))
            if "tangent" in fields:
                out = out.replace(tangent=jnp.zeros((E, M * NR, 3), dist.dtype))
        else:
            if cfg.reduce == "mindist":
                key = dist
            elif cfg.reduce == "maxforce":
                fmag = jnp.linalg.norm(force_w, axis=-1)
                key = jnp.where(active, -fmag, jnp.inf)
            else:  # "none": static order among active
                key = jnp.where(
                    active, jnp.arange(S, dtype=jnp.float32)[None, None], jnp.inf
                )
            order = jnp.argsort(key, axis=-1)[..., :NR]  # (E, M, NR)
            picked = jnp.take_along_axis(active, order, axis=-1)  # (E,M,NR)
            if "found" in fields:
                out = out.replace(
                    found=jnp.where(
                        picked, found_count[..., None], 0
                    ).reshape(E, M * NR)
                )
            if "dist" in fields:
                out = out.replace(
                    dist=jnp.where(
                        picked,
                        jnp.take_along_axis(dist, order, axis=-1),
                        0.0,
                    ).reshape(E, M * NR)
                )
            if {"force", "torque"} & fields:
                # contact frames come from the COMPACTED record (the only
                # slots that can carry force): con_packed_c cols 17:26
                frame = self._expand_compacted(
                    d, d.con_packed_c[..., 17:26]
                ).reshape(E, M, S, 3, 3)
                frame_p = jnp.take_along_axis(
                    frame, order[..., None, None], axis=2
                )  # (E, M, NR, 3, 3)
                # when the primary is the contact's geom2, MuJoCo flips
                # normal and first tangent (s = -1) so the output frame is
                # (s n, s t1, t2); sgn=+1 means primary is geom2 -> s=-sgn
                sflip = -jnp.take_along_axis(
                    jnp.broadcast_to(sgn[None], active.shape), order, axis=-1
                )  # (E, M, NR)
                for fname, w in (("force", force_w), ("torque", torque_w)):
                    if fname not in fields:
                        continue
                    w_p = jnp.take_along_axis(w, order[..., None], axis=2)
                    w_by = -w_p  # world, applied BY the primary
                    if cfg.global_frame:
                        w_out = w_by
                    else:
                        # components in the output frame (s n, s t1, t2)
                        comps = jnp.einsum("emrfx,emrx->emrf", frame_p, w_by)
                        w_out = jnp.stack(
                            [
                                sflip * comps[..., 0],
                                sflip * comps[..., 1],
                                comps[..., 2],
                            ],
                            axis=-1,
                        )
                    w_out = jnp.where(picked[..., None], w_out, 0.0)
                    out = out.replace(**{fname: w_out.reshape(E, M * NR, 3)})
            if {"pos", "normal", "tangent"} & fields:
                out = self._geom_fields(
                    out, d, fields, order, active, sgn, NR=NR
                )

        if cfg.track_air_time and self.name in ctx.sensor_states:
            s = ctx.sensor_states[self.name]
            out = out.replace(
                current_air_time=s.current_air_time,
                current_contact_time=s.current_contact_time,
                last_air_time=s.last_air_time,
                last_contact_time=s.last_contact_time,
            )
        return out

    def _tile(self, x, NR):
        """(E, M) -> (E, M*NR) with the value in slot 0, zeros after
        (netforce produces one aggregate row per primary)."""
        E, M = x.shape
        if NR == 1:
            return x
        out = jnp.zeros((E, M, NR), x.dtype).at[:, :, 0].set(x)
        return out.reshape(E, M * NR)

    def _tile_vec(self, x, NR):
        E, M, C = x.shape
        if NR == 1:
            return x
        out = jnp.zeros((E, M, NR, C), x.dtype).at[:, :, 0].set(x)
        return out.reshape(E, M * NR, C)

    def _geom_fields(self, out, d, fields, order, active, sgn, NR):
        """pos/normal/tangent for the chosen slots. order: (E, M, R).

        Geometry comes from the COMPACTED per-slot record (expanded onto
        this sensor's static slot table): found/dist stay exact for every
        slot, while pos/normal/tangent of a found-but-not-top-K contact
        read as zero — such contacts carry no solver force either, and
        K (SimulationCfg.nconmax) bounds the solver-visible set."""
        st = self.slot_table
        E = active.shape[0]
        M, S = st.shape
        R = order.shape[-1]
        picked = jnp.take_along_axis(active, order, axis=-1)  # (E, M, R)
        sgn_of = jnp.take_along_axis(
            jnp.broadcast_to(sgn[None], (E, M, S)), order, axis=-1
        )

        def shape_out(x):
            if NR is None:  # netforce path: single row per primary
                x = x[:, :, 0]
                return self._tile_vec(x, self.cfg.num_slots)
            return x.reshape(E, M * R, x.shape[-1])

        if "pos" in fields:
            pos_s = self._expand_compacted(
                d, d.con_packed_c[..., 2:5]
            )  # (E, M, S, 3)
            pos = jnp.take_along_axis(pos_s, order[..., None], axis=2)
            pos = jnp.where(picked[..., None], pos, 0.0)
            out = out.replace(pos=shape_out(pos))
        if {"normal", "tangent"} & fields:
            frame_s = self._expand_compacted(
                d, d.con_packed_c[..., 17:26]
            ).reshape(E, M, S, 3, 3)
            frame = jnp.take_along_axis(
                frame_s, order[..., None, None], axis=2
            )  # (E, M, R, 3, 3)
            if "normal" in fields:
                # engine normal points geom1 -> geom2; flip so it points
                # primary -> secondary (sgn=+1 means primary is geom2)
                nrm = frame[..., 0, :] * (-sgn_of[..., None])
                nrm = jnp.where(picked[..., None], nrm, 0.0)
                out = out.replace(normal=shape_out(nrm))
            if "tangent" in fields:
                # MuJoCo flips the first tangent together with the normal
                # to keep the output frame right-handed
                tng = frame[..., 1, :] * (-sgn_of[..., None])
                tng = jnp.where(picked[..., None], tng, 0.0)
                out = out.replace(tangent=shape_out(tng))
        return out

    @property
    def data(self) -> ContactData:
        return self._compute(self.ctx)

    def _found_per_primary(self, ctx):
        d = ctx.data
        st = self.slot_table
        active = d.con_found[:, st] & self.slot_mask
        return jnp.any(active, axis=-1)  # (E, M)

    def update(self, ctx, dt: float) -> None:
        if not self.cfg.track_air_time:
            return
        s = ctx.sensor_states[self.name]
        found = self._found_per_primary(ctx)
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
        found = self._found_per_primary(self.ctx)
        return found & (s.current_contact_time <= dt)

    def compute_first_air(self, dt: float) -> jax.Array:
        s = self.ctx.sensor_states[self.name]
        found = self._found_per_primary(self.ctx)
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
