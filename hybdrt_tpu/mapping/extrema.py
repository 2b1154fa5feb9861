"""Ridge/trough alternation consistency in 2-D maps
(reference hybdrt/mapping/extrema.py): local add/remove moves that enforce the
physical requirement that ridges and troughs alternate along the tau axis."""
import numpy as np


def _row_violations(ridge_row, trough_row):
    """Count adjacent same-type extrema (non-alternating) in one row."""
    events = []
    for idx in np.where(ridge_row)[0]:
        events.append((idx, 1))
    for idx in np.where(trough_row)[0]:
        events.append((idx, -1))
    events.sort()
    count = 0
    for (_, a), (_, b) in zip(events[:-1], events[1:]):
        if a == b:
            count += 1
    return count


def alternation_energy(ridge_mask, trough_mask):
    return sum(_row_violations(r, t) for r, t in zip(ridge_mask, trough_mask))


def optimize_extrema_2d(ridge_mask, trough_mask, p_ridge=None, p_trough=None,
                        max_iter=100):
    """Greedy repair: for each alternation violation, remove the weaker of the
    two same-type extrema (by probability) or insert the missing opposite
    extremum between them (reference extrema.py:83-172, greedy variant)."""
    ridge_mask = np.array(ridge_mask, dtype=bool)
    trough_mask = np.array(trough_mask, dtype=bool)
    if p_ridge is None:
        p_ridge = ridge_mask.astype(float)
    if p_trough is None:
        p_trough = trough_mask.astype(float)

    for row in range(ridge_mask.shape[0]):
        for _ in range(max_iter):
            events = sorted([(i, 1) for i in np.where(ridge_mask[row])[0]]
                            + [(i, -1) for i in np.where(trough_mask[row])[0]])
            fixed = False
            for (i1, t1), (i2, t2) in zip(events[:-1], events[1:]):
                if t1 != t2:
                    continue
                if i2 - i1 > 2:
                    # Insert the missing opposite extremum between them
                    mid_lo, mid_hi = i1 + 1, i2
                    if t1 == 1:
                        pos = mid_lo + int(np.argmax(p_trough[row, mid_lo:mid_hi]))
                        trough_mask[row, pos] = True
                    else:
                        pos = mid_lo + int(np.argmax(p_ridge[row, mid_lo:mid_hi]))
                        ridge_mask[row, pos] = True
                else:
                    # Too close to insert: drop the weaker one
                    p = p_ridge if t1 == 1 else p_trough
                    mask = ridge_mask if t1 == 1 else trough_mask
                    drop = i1 if p[row, i1] <= p[row, i2] else i2
                    mask[row, drop] = False
                fixed = True
                break
            if not fixed:
                break
    return ridge_mask, trough_mask


def optimize_extrema(ridge_mask, trough_mask, p_ridge=None, p_trough=None,
                     max_iter=100):
    """N-d entry point: masks of shape (*group_dims, rows, tau) are repaired
    one 2-D (rows, tau) slab at a time (reference extrema.py:175-221).

    Intentional divergence (see PARITY.md): the reference couples
    neighboring slabs through cross-slab Gaussian attraction fields
    (ridge_field/trough_field computed over the masked N-d volume); this
    greedy variant repairs each slab independently, so alternation is
    enforced within a slab but not attracted across slabs."""
    ridge_mask = np.array(ridge_mask, dtype=bool)
    trough_mask = np.array(trough_mask, dtype=bool)
    if ridge_mask.ndim <= 2:
        return optimize_extrema_2d(ridge_mask, trough_mask,
                                   p_ridge=p_ridge, p_trough=p_trough,
                                   max_iter=max_iter)
    group_shape = ridge_mask.shape[:-2]
    rm_out = ridge_mask.copy()
    tm_out = trough_mask.copy()
    for idx in np.ndindex(*group_shape):
        pr = None if p_ridge is None else np.asarray(p_ridge)[idx]
        pt = None if p_trough is None else np.asarray(p_trough)[idx]
        rm_out[idx], tm_out[idx] = optimize_extrema_2d(
            ridge_mask[idx], trough_mask[idx], p_ridge=pr, p_trough=pt,
            max_iter=max_iter)
    return rm_out, tm_out
