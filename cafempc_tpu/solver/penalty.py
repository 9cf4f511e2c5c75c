"""Relaxed-Barrier (ReB) and Augmented-Lagrangian (AL) penalty math.

Batched, mask-aware mirrors of the reference formulas:
  * ReB cost / partials:   ConstraintsBase.h:230-289
  * ReB parameter update:  ConstraintsBase.h:194-209 + REB_Param_Struct:73-86
  * AL cost / partials:    ConstraintsBase.h:400-425 (incl. the reference's
                           sigma*(1+h)+lambda Gauss-Newton Hessian form)
  * AL parameter update:   ConstraintsBase.h:375-391 + AL_Param_Struct:58-70

All functions operate on flat constraint vectors ``g``/``h`` with an
``active`` 0/1 mask; inactive entries contribute exactly zero.
"""
import jax.numpy as jnp


def reb_barrier(g, delta, active):
    """Relaxed log-barrier value per constraint (unweighted)."""
    g = jnp.where(active > 0, g, 1.0)
    quad = 0.5 * (jnp.square((g - 2.0 * delta) / delta) - 1.0) \
        - jnp.log(delta)
    # guard log(g) for g<=0 (the quadratic branch is selected there)
    log_term = -jnp.log(jnp.where(g > delta, g, 1.0))
    barr = jnp.where(g > delta, log_term, quad)
    return jnp.where(active > 0, barr, 0.0)


def reb_barrier_d(g, delta, active):
    """(barr', barr'') per constraint."""
    g = jnp.where(active > 0, g, 1.0)
    d1 = jnp.where(g > delta, -1.0 / g, (g - 2.0 * delta) / (delta * delta))
    d2 = jnp.where(g > delta, 1.0 / (g * g), 1.0 / (delta * delta))
    z = jnp.zeros_like(g)
    return (jnp.where(active > 0, d1, z), jnp.where(active > 0, d2, z))


def reb_cost(g, delta, eps_w, active):
    """Sum_i eps_i * barr(g_i).  Caller multiplies by dt
    (SinglePhase.cpp:394-402)."""
    return jnp.sum(eps_w * reb_barrier(g, delta, active))


def reb_partials(g, gx, gu, gy, delta, eps_w, active):
    """Gauss-Newton gradients/Hessians of the folded barrier w.r.t x,u,y.

    gx: [nc, xs], gu: [nc, us], gy: [nc, ys].  Linear constraints assumed
    (gxx=0), exactly as every reference path constraint provides
    (MHPCConstraint.cpp, HKDConstraints.cpp).
    Returns (grad_x, grad_u, grad_y, hess_x, hess_u, hess_y).
    """
    d1, d2 = reb_barrier_d(g, delta, active)
    w1 = eps_w * d1
    w2 = eps_w * d2
    grad_x = gx.T @ w1
    grad_u = gu.T @ w1
    grad_y = gy.T @ w1
    hess_x = (gx * w2[:, None]).T @ gx
    hess_u = (gu * w2[:, None]).T @ gu
    hess_y = (gy * w2[:, None]).T @ gy
    return grad_x, grad_u, grad_y, hess_x, hess_u, hess_y


def reb_update_params(g, delta, eps_w, active, thresh, beta_relax,
                      beta_weight, delta_min):
    """Per-(knot, constraint) adaptive update: only entries with
    g <= -thresh (violated) are updated (ConstraintsBase.h:194-209)."""
    upd = (active > 0) & (g <= -thresh)
    eps_new = jnp.where(upd, eps_w * beta_weight, eps_w)
    delta_new = jnp.where(upd, jnp.maximum(delta * beta_relax, delta_min),
                          delta)
    return delta_new, eps_new


def al_cost(h, lam, sigma, active):
    """Sum_i 0.5*sigma_i*h_i^2 + lambda_i*h_i (ConstraintsBase.h:400-411)."""
    h = jnp.where(active > 0, h, 0.0)
    return jnp.sum(0.5 * sigma * h * h + lam * h)


def al_partials(h, hx, lam, sigma, active):
    """AL gradient/Hessian (ConstraintsBase.h:412-425).  NOTE: mirrors the
    reference's Hessian  sum (sigma*(1+h)+lambda) hx hx^T  exactly."""
    h = jnp.where(active > 0, h, 0.0)
    gw = (sigma * h + lam) * (active > 0)
    hw = (sigma * (1.0 + h) + lam) * (active > 0)
    grad = hx.T @ gw
    hess = (hx * hw[:, None]).T @ hx
    return grad, hess


def al_update_params(h, lam, sigma, active, thresh, beta, sigma_max):
    """Per-constraint schedule (ConstraintsBase.h:375-391):
    |h| < thresh: no-op; |h| > 0.005: sigma <- min(sigma*beta, sigma_max);
    else: lambda += h*sigma."""
    habs = jnp.abs(jnp.where(active > 0, h, 0.0))
    bump = (habs >= thresh) & (habs > 0.005)
    lag = (habs >= thresh) & (habs <= 0.005)
    sigma_new = jnp.where(bump, jnp.minimum(sigma * beta, sigma_max), sigma)
    lam_new = jnp.where(lag, lam + h * sigma, lam)
    return lam_new, sigma_new
