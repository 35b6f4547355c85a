"""Slow, loop-exact numpy oracles for the reference CPU semantics.

The reference ships no tests; its CPU numba kernels
(stereoimage_generation.py:1622-1992) are the de-facto specification
(SURVEY.md §4, BASELINE.md). These are fresh numpy re-implementations of those
semantics — intentionally written as plain per-pixel loops so they are easy to
audit against the spec, and used ONLY as golden references in the test suite.
"""
from __future__ import annotations

import math

import numpy as np
from scipy.ndimage import convolve1d, sobel


# ---------------------------------------------------------------------------
# Depth math
# ---------------------------------------------------------------------------

def normalize_depth(depth: np.ndarray) -> np.ndarray:
    d = depth.astype(np.float32)
    dmin, dmax = d.min(), d.max()
    if dmax == dmin:
        return np.zeros_like(d)
    return (d - dmin) / (dmax - dmin)


def dispatch(original_image, depth, divergence, separation, exponent,
             fill_technique, convergence_point=0.5):
    """Reference dispatcher semantics (:1576-1620). image uint8 [H,W,C]."""
    nd = normalize_depth(depth) - convergence_point
    w = original_image.shape[1]
    div_px = (divergence / 100.0) * w
    sep_px = (separation / 100.0) * w
    if fill_technique in ("none", "naive", "naive_interpolating"):
        return naive(original_image, nd, div_px, sep_px, exponent, fill_technique)
    if fill_technique == "none_post":
        base, mask = naive_with_mask(original_image, nd, div_px, sep_px, exponent)
        return post_fill(base, mask)
    if fill_technique == "inverse":
        out, _ = inverse_with_mask(original_image, nd, div_px, sep_px, exponent)
        return out
    if fill_technique == "inverse_post":
        base, mask = inverse_with_mask(original_image, nd, div_px, sep_px, exponent)
        return post_fill(base, mask)
    if fill_technique == "hybrid_edge":
        return hybrid_edge(original_image, nd, div_px, sep_px, exponent)
    if fill_technique == "hybrid_edge_plus":
        filled = hybrid_edge(original_image, nd, div_px, sep_px, exponent)
        poly = polylines(original_image, nd, div_px, sep_px, exponent, "polylines_soft")
        out = filled.copy()
        black = (filled[..., 0] == 0) & (filled[..., 1] == 0) & (filled[..., 2] == 0)
        out[black] = poly[black]
        return out
    if fill_technique in ("polylines_soft", "polylines_sharp"):
        return polylines(original_image, nd, div_px, sep_px, exponent, fill_technique)
    return original_image


# ---------------------------------------------------------------------------
# Naive scatter family (spec :1850-1910, :1664-1685)
# ---------------------------------------------------------------------------

def naive_with_mask(img, nd, div_px, sep_px, exponent):
    h, w, c = img.shape
    derived = np.zeros_like(img)
    filled = np.zeros(h * w, dtype=np.uint8)
    for row in range(h):
        cols = range(w) if div_px < 0 else range(w - 1, -1, -1)
        for col in cols:
            d = float(nd[row, col])
            sign_d = 1.0 if d >= 0.0 else -1.0
            col_d = col + int(sign_d * (abs(d) ** exponent) * div_px + sep_px)
            if 0 <= col_d < w:
                derived[row, col_d] = img[row, col]
                filled[row * w + col_d] = 1
    return derived, filled.reshape(h, w)


def naive(img, nd, div_px, sep_px, exponent, fill_technique):
    h, w, c = img.shape
    derived, filled2d = naive_with_mask(img, nd, div_px, sep_px, exponent)
    filled = filled2d.reshape(-1)

    if fill_technique == "naive_interpolating":
        derived = derived.copy()
        for row in range(h):
            for l_pointer in range(w):
                if derived[row, l_pointer].sum() != 0 or filled[row * w + l_pointer]:
                    continue
                l_border = derived[row, l_pointer - 1] if l_pointer > 0 else \
                    np.zeros(3, dtype=np.uint8)
                r_border = np.zeros(3, dtype=np.uint8)
                r_pointer = l_pointer + 1
                while r_pointer < w:
                    if derived[row, r_pointer].sum() != 0 and filled[row * w + r_pointer]:
                        r_border = derived[row, r_pointer]
                        break
                    r_pointer += 1
                if l_border.sum() == 0:
                    l_border = r_border
                elif r_border.sum() == 0:
                    r_border = l_border
                total_steps = 1 + r_pointer - l_pointer
                step = (r_border.astype(np.float32) - l_border) / total_steps
                for col in range(l_pointer, r_pointer):
                    derived[row, col] = l_border + \
                        (step * (col - l_pointer + 1)).astype(np.uint8)
        return derived
    elif fill_technique == "naive":
        derived_fix = derived.copy()
        max_off = abs(int(div_px)) + 1
        for pos in np.where(filled == 0)[0]:
            row, col = pos // w, pos % w
            for offset in range(1, max_off + 1):
                r_off, l_off = col + offset, col - offset
                if r_off < w and filled[row * w + r_off]:
                    derived_fix[row, col] = derived[row, r_off]
                    break
                if 0 <= l_off and filled[row * w + l_off]:
                    derived_fix[row, col] = derived[row, l_off]
                    break
        return derived_fix
    return derived


# ---------------------------------------------------------------------------
# Inverse z-splat (spec :1688-1737)
# ---------------------------------------------------------------------------

def inverse_with_mask(img, nd, div_px, sep_px, exponent):
    h, w, c = img.shape
    derived = np.zeros_like(img)
    mask = np.zeros((h, w), dtype=np.uint8)
    for row in range(h):
        depth_buffer = np.full(w, -1.0, dtype=np.float32)
        for x in range(w):
            d = float(nd[row, x])
            sign_d = 1.0 if d >= 0.0 else -1.0
            offset = sign_d * (abs(d) ** exponent) * div_px
            dest_x = x + 0.5 + offset + sep_px
            closeness = nd[row, x]
            j = int(np.floor(dest_x))
            for jj in (j, j + 1):
                if 0 <= jj < w and closeness > depth_buffer[jj]:
                    derived[row, jj] = img[row, x]
                    depth_buffer[jj] = closeness
                    mask[row, jj] = 1
    return derived, mask


# ---------------------------------------------------------------------------
# Gaussian splat + edge-aware fill (spec :1622-1661, :1745-1774)
# ---------------------------------------------------------------------------

def gaussian_splat_with_mask(img, nd, div_px, sep_px, exponent):
    h, w, c = img.shape
    accum = np.zeros((h, w, c), dtype=np.float32)
    wsum = np.zeros((h, w), dtype=np.float32)
    mask = np.zeros((h, w), dtype=np.uint8)
    for row in range(h):
        for x in range(w):
            d = float(nd[row, x])
            sign_d = 1.0 if d >= 0.0 else -1.0
            offset = sign_d * (abs(d) ** exponent) * div_px
            dest_x = x + 0.5 + offset + sep_px
            j_center = int(math.floor(dest_x))
            for dd in (-1, 0, 1):
                j = j_center + dd
                if 0 <= j < w:
                    diff = dest_x - j
                    wg = math.exp(-(diff * diff) / 2.0)
                    accum[row, j] += img[row, x] * wg
                    wsum[row, j] += wg
                    mask[row, j] = 1
    out = np.zeros((h, w, c), dtype=np.uint8)
    nz = wsum > 0
    vals = np.clip(accum[nz] / wsum[nz][:, None], 0, 255)
    out[nz] = vals.astype(np.uint8)
    return out, mask


def rgb2gray(image):
    return 0.299 * image[..., 0] + 0.587 * image[..., 1] + 0.114 * image[..., 2]


def edge_aware_gap_fill(image, mask, guidance, window_size=3, sigma_s=1.0,
                        sigma_r=10.0):
    h, w, c = image.shape
    filled = image.astype(np.float32).copy()
    half = window_size // 2
    for i in range(h):
        for j in range(w):
            if mask[i, j] != 0:
                continue
            acc = np.zeros(c, dtype=np.float32)
            tot = 0.0
            for di in range(-half, half + 1):
                for dj in range(-half, half + 1):
                    ni, nj = i + di, j + dj
                    if 0 <= ni < h and 0 <= nj < w and mask[ni, nj] != 0:
                        ws = math.exp(-(di * di + dj * dj) / (2 * sigma_s ** 2))
                        diff = guidance[i, j] - guidance[ni, nj]
                        wr = math.exp(-(diff * diff) / (2 * sigma_r ** 2))
                        acc += image[ni, nj].astype(np.float32) * (ws * wr)
                        tot += ws * wr
            if tot > 0:
                filled[i, j] = acc / tot
    return np.clip(filled, 0, 255).astype(np.uint8)


def hybrid_edge(img, nd, div_px, sep_px, exponent):
    base, mask = gaussian_splat_with_mask(img, nd, div_px, sep_px, exponent)
    guidance = rgb2gray(np.asarray(img))
    return edge_aware_gap_fill(base, mask, guidance)


# ---------------------------------------------------------------------------
# Row-wise post fill (spec :1804-1833)
# ---------------------------------------------------------------------------

def post_fill(base_img, mask):
    h, w, c = base_img.shape
    output = base_img.astype(np.float32).copy()
    x_coords = np.arange(w, dtype=np.float32)
    for row in range(h):
        valid = np.nonzero(mask[row])[0]
        if valid.size == 0:
            continue
        for ch in range(c):
            row_data = base_img[row, :, ch].astype(np.float32)
            output[row, :, ch] = np.interp(
                x_coords, valid.astype(np.float32), row_data[valid])
    return output.astype(np.uint8)


# ---------------------------------------------------------------------------
# Polylines sweep (spec :1912-1992)
# ---------------------------------------------------------------------------

def polylines(img, nd, div_px, sep_px, exponent, fill_technique):
    eps = 1e-7
    half_width = 0.45 if fill_technique == "polylines_sharp" else 0.0
    h, w, c = img.shape
    out = np.zeros_like(img)
    for row in range(h):
        # Build warped point list with off-screen sentinels. Arithmetic is
        # float32 end-to-end: the reference stores points in a float32 array
        # (stereoimage_generation.py:1920), and the framework's exact
        # integrator computes the sweep in f32 (see ops/polylines_exact.py's
        # dtype note) — the f32 sweep stays within 1 uint8 LSB of numba's
        # f64-upcast intermediates.
        pts = [(np.float32(-1.0 * w), np.float32(0.0), 0)]
        for col in range(w):
            d = nd[row, col].astype(np.float32)
            sign_d = np.float32(1.0 if d >= 0.0 else -1.0)
            coord_d = sign_d * (np.abs(d) ** np.float32(exponent)) \
                * np.float32(div_px)
            coord_x = np.float32(col + 0.5) + coord_d + np.float32(sep_px)
            if half_width < eps:
                pts.append((coord_x, np.abs(coord_d), col))
            else:
                pts.append((coord_x - np.float32(half_width),
                            np.abs(coord_d), col))
                pts.append((coord_x + np.float32(half_width),
                            np.abs(coord_d), col))
        pts.append((np.float32(2.0 * w), np.float32(0.0), w - 1))

        # Segments pair consecutive points (pre-sort order).
        segs = [pts[i] + pts[i + 1] for i in range(len(pts) - 1)]
        # The spec insertion-sorts points by x and co-swaps segments with the
        # identical swap sequence — equivalent to two stable sorts keyed on
        # each point's x (the trailing sentinel is already maximal).
        order = sorted(range(len(pts)), key=lambda i: pts[i][0])
        pt_sorted = [pts[i] for i in order]
        pair_order = sorted(range(len(segs)), key=lambda i: pts[i][0])
        sg_sorted = [segs[i] for i in pair_order]

        active = []
        sg_ptr = 0
        pt_i = 0
        for col in range(w):
            color = np.full(c, 0.5, dtype=np.float32)
            while pt_sorted[pt_i][0] < col:
                pt_i += 1
            pt_i -= 1
            while pt_sorted[pt_i][0] < col + 1:
                coord_from = np.float32(max(col, pt_sorted[pt_i][0])) \
                    + np.float32(eps)
                coord_to = np.float32(min(col + 1, pt_sorted[pt_i + 1][0])) \
                    - np.float32(eps)
                significance = coord_to - coord_from
                center = coord_from + np.float32(0.5) * significance
                while sg_ptr < len(sg_sorted) and sg_sorted[sg_ptr][0] < center:
                    active.append(sg_sorted[sg_ptr])
                    sg_ptr += 1
                # swap-remove expired segments
                k = 0
                while k < len(active):
                    if active[k][3] < center:
                        active[k] = active[-1]
                        active.pop()
                    else:
                        k += 1
                best = 0
                if len(active) != 1:
                    best_closeness = -eps
                    for k in range(len(active)):
                        sgk = active[k]
                        ipk = (center - sgk[0]) / (sgk[3] - sgk[0])
                        closeness = (1.0 - ipk) * sgk[1] + ipk * sgk[4]
                        if best_closeness < closeness and 0.0 < ipk < 1.0:
                            best_closeness = closeness
                            best = k
                sgb = active[best]
                col_l = int(sgb[2] + eps)
                col_r = int(sgb[5] + eps)
                if col_l == col_r:
                    color += img[row, col_l] * significance
                else:
                    ipk = (center - sgb[0]) / (sgb[3] - sgb[0])
                    color += (img[row, col_l] * (1.0 - ipk) +
                              img[row, col_r] * ipk) * significance
                pt_i += 1
            out[row, col] = color.astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# Directional depth blur (spec :1346-1419)
# ---------------------------------------------------------------------------

def directional_motion_blur(depth, blur_strength, edge_threshold,
                            blur_mask_width=5, falloff_exponent=1.0,
                            vert_smooth_px=0):
    if blur_strength <= 0:
        return depth, depth
    n = int(round(blur_strength))
    mask_radius = int(blur_mask_width)
    h, w = depth.shape

    grad_x = sobel(depth, axis=1)
    edge_str = np.clip(np.abs(grad_x) / (10 * edge_threshold), 0, 1)
    left_edges = (grad_x > 0) & (edge_str > 0.5)
    right_edges = (grad_x < 0) & (edge_str > 0.5)

    cols = np.arange(w, dtype=np.float32)
    large = float(mask_radius + 1)

    def dist_weight(mask):
        col_l = np.where(mask, np.broadcast_to(cols, (h, w)), -1.0)
        last_l = np.maximum.accumulate(col_l, axis=1)
        dist_l = np.where(last_l >= 0, cols[None, :] - last_l, large)
        col_r = np.where(mask[:, ::-1], np.broadcast_to(cols, (h, w)), -1.0)
        last_r = np.maximum.accumulate(col_r, axis=1)
        dist_r = np.where(last_r >= 0, cols[None, :] - last_r, large)[:, ::-1]
        dist = np.minimum(dist_l, dist_r)
        return np.clip(1.0 - dist / mask_radius, 0.0, 1.0) ** falloff_exponent

    wl = dist_weight(left_edges)
    wr = dist_weight(right_edges)
    if vert_smooth_px > 0:
        vk = np.ones(2 * vert_smooth_px + 1) / (2 * vert_smooth_px + 1)
        wl = np.clip(convolve1d(wl, vk, axis=0, mode="nearest"), 0.0, 1.0)
        wr = np.clip(convolve1d(wr, vk, axis=0, mode="nearest"), 0.0, 1.0)

    kernel = np.ones(n) / n
    blurred = convolve1d(depth, kernel, axis=1, mode="nearest")
    return wl * blurred + (1.0 - wl) * depth, wr * blurred + (1.0 - wr) * depth


# ---------------------------------------------------------------------------
# Forward warp with z-buffer (spec :277-450) — sequential candidate loop.
# ---------------------------------------------------------------------------

def forward_warp(image, depth, div_px, sep_px, exponent, convergence=0.5,
                 gradient_threshold=1.5, max_stretch=8):
    """image [H,W,C] float 0-1, depth [H,W]. Returns (warped, gap_mask)."""
    h, w, c = image.shape
    nd = normalize_depth(depth)
    shifted = nd - convergence
    offset = np.sign(shifted) * np.abs(shifted) ** exponent * div_px + sep_px
    dest = np.arange(w, dtype=np.float32)[None, :] + offset

    source_map = np.full((h, w), -1.0, dtype=np.float32)
    z_buffer = np.full((h, w), -1.0, dtype=np.float32)
    for row in range(h):
        for i in range(w - 1):
            if abs(offset[row, i + 1] - offset[row, i]) >= gradient_threshold:
                continue
            dl, dr = dest[row, i], dest[row, i + 1]
            zl, zr = nd[row, i], nd[row, i + 1]
            width = dr - dl
            safe = width if abs(width) >= 1e-4 else 1.0
            start = int(np.floor(min(dl, dr)))
            for k in range(max_stretch):
                cc = start + k
                if not (0 <= cc < w):
                    continue
                frac = (cc - dl) / safe
                if not (0.0 <= frac < 1.0):
                    continue
                zz = zl * (1 - frac) + zr * frac
                if zz > z_buffer[row, cc] + 1e-6:
                    z_buffer[row, cc] = zz
                    source_map[row, cc] = i + frac

    unfilled = source_map < 0
    # Gap fill: border interpolation with sqrt background bias.
    for row in range(h):
        cols = np.arange(w)
        fill_mask = ~unfilled[row]
        if not fill_mask.any():
            continue
        left_near = np.maximum.accumulate(np.where(fill_mask, cols, -1))
        rn_rev = np.maximum.accumulate(np.where(fill_mask[::-1], cols[::-1], -1))
        right_near = rn_rev[::-1]
        has_l, has_r = left_near >= 0, right_near >= 0
        ls = source_map[row, np.clip(left_near, 0, w - 1)]
        rs = source_map[row, np.clip(right_near, 0, w - 1)]
        lz = z_buffer[row, np.clip(left_near, 0, w - 1)]
        rz = z_buffer[row, np.clip(right_near, 0, w - 1)]
        ld = (cols - left_near).astype(np.float32)
        rd = (right_near - cols).astype(np.float32)
        tot = np.maximum(ld + rd, 1.0)
        t = ld / tot
        t = np.where(~has_l, 1.0, t)
        t = np.where(~has_r, 0.0, t)
        tb = np.where(lz < rz, np.sqrt(t), 1.0 - np.sqrt(1.0 - t))
        gap = ls * (1 - tb) + rs * tb
        row_src = np.where(unfilled[row] & (has_l | has_r), gap, source_map[row])
        source_map[row] = row_src
    source_map = np.clip(source_map, 0, w - 1)

    x0 = np.floor(source_map).astype(np.int32)
    x1 = np.minimum(x0 + 1, w - 1)
    fr = (source_map - x0)[..., None]
    rows = np.arange(h)[:, None]
    warped = image[rows, x0] * (1 - fr) + image[rows, x1] * fr
    return warped, unfilled
