"""ZYX-Euler rotation utilities, shared by all models.

Euler convention throughout the framework: ``eul = (yaw, pitch, roll)``,
rotation ``R = Rz(yaw) @ Ry(pitch) @ Rx(roll)`` mapping body -> world.
Body angular velocity relates to Euler rates via ``omega_b = B(eul) @ euld``
(cf. reference scripts/Reference_matlab/euld2omegabMat.m:1-15 and the HKD /
SRB generated kernels, whose conventions were verified numerically against
tests/fixtures/*.npz).
"""
import jax.numpy as jnp


def rotz(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack([
        jnp.stack([c, -s, z], -1),
        jnp.stack([s, c, z], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def roty(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack([
        jnp.stack([c, z, s], -1),
        jnp.stack([z, o, z], -1),
        jnp.stack([-s, z, c], -1),
    ], -2)


def rotx(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack([
        jnp.stack([o, z, z], -1),
        jnp.stack([z, c, -s], -1),
        jnp.stack([z, s, c], -1),
    ], -2)


def eul_to_rot(eul):
    """Body->world rotation from (yaw, pitch, roll)."""
    return rotz(eul[..., 0]) @ roty(eul[..., 1]) @ rotx(eul[..., 2])


def euldrate_to_omega_mat(eul):
    """B(eul): maps Euler rates (yawd, pitchd, rolld) to body angular
    velocity: omega_b = B @ euld.  ZYX convention."""
    pitch = eul[..., 1]
    roll = jnp.asarray(eul[..., 2])
    sp, cp = jnp.sin(pitch), jnp.cos(pitch)
    sr, cr = jnp.sin(roll), jnp.cos(roll)
    z, o = jnp.zeros_like(sp), jnp.ones_like(sp)
    return jnp.stack([
        jnp.stack([-sp, z, o], -1),
        jnp.stack([cp * sr, cr, z], -1),
        jnp.stack([cp * cr, -sr, z], -1),
    ], -2)


def omega_to_euldrate_mat(eul):
    """B(eul)^-1 in closed form: euld = Binv @ omega_b."""
    pitch = eul[..., 1]
    roll = jnp.asarray(eul[..., 2])
    sp, cp = jnp.sin(pitch), jnp.cos(pitch)
    sr, cr = jnp.sin(roll), jnp.cos(roll)
    z = jnp.zeros_like(sp)
    o = jnp.ones_like(sp)
    # Binv rows solve: omega = B euld
    #   yawd   = (sr*om_y + cr*om_z)/cp
    #   pitchd = cr*om_y - sr*om_z
    #   rolld  = om_x + sp*(sr*om_y + cr*om_z)/cp
    return jnp.stack([
        jnp.stack([z, sr / cp, cr / cp], -1),
        jnp.stack([z, cr, -sr], -1),
        jnp.stack([o, sp * sr / cp, sp * cr / cp], -1),
    ], -2)


def skew(v):
    """3-vector -> skew-symmetric matrix, batched over leading dims."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], -1),
        jnp.stack([v[..., 2], z, -v[..., 0]], -1),
        jnp.stack([-v[..., 1], v[..., 0], z], -1),
    ], -2)
