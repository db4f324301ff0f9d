"""Test oracle: a literal per-pixel/per-face numpy transcription of the
reference CUDA forward kernel math (soft_rasterize_cuda_kernel.cu). Slow —
only for tiny images in tests. Not part of the framework.
"""

import numpy as np


def _face_info(face):
    # face: [3,3] (x,y,z) rows
    p = face[:, :2]
    star = np.array(
        [
            [p[1, 1] - p[2, 1], p[2, 0] - p[1, 0],
             p[1, 0] * p[2, 1] - p[2, 0] * p[1, 1]],
            [p[2, 1] - p[0, 1], p[0, 0] - p[2, 0],
             p[2, 0] * p[0, 1] - p[0, 0] * p[2, 1]],
            [p[0, 1] - p[1, 1], p[1, 0] - p[0, 0],
             p[0, 0] * p[1, 1] - p[1, 0] * p[0, 1]],
        ]
    )
    det = (p[2, 0] * (p[0, 1] - p[1, 1]) + p[0, 0] * (p[1, 1] - p[2, 1])
           + p[1, 0] * (p[2, 1] - p[0, 1]))
    # ONE deliberate deviation from the literal CUDA transcription: the
    # framework culls projection-degenerate faces (|det| at/below the
    # clamp) in every implementation — exactly-edge-on faces otherwise
    # shade with clamp garbage no two backends reproduce identically.
    # The oracle mirrors the cull so comparisons stay meaningful.
    nondegen = abs(det) > 1e-10
    det = max(det, 1e-10) if det > 0 else min(det, -1e-10)
    inv = star / det
    sym = p @ p.T + 1.0
    obt = np.zeros(3)
    for k in range(3):
        k1, k2 = (k + 1) % 3, (k + 2) % 3
        if np.dot(p[k1] - p[k], p[k2] - p[k]) < 0:
            obt[k] = 1
            break
    return inv, sym, obt, nondegen


def _euclidean(w, face, sym, obt, xp, yp):
    fx, fy = face[:, 0], face[:, 1]
    t = np.zeros(3)
    if np.all(w > 0) and np.all(w < 1):
        dis_min, dx_min, dy_min = 1e8, 0.0, 0.0
        for k in range(3):
            v0, v1, v2 = k, (k + 1) % 3, (k + 2) % 3
            a0 = sym[v0] - sym[v1]
            t0 = np.zeros(3)
            t0[v0] = (w @ a0 - a0[v1]) / (a0[v0] - a0[v1])
            t0[v1] = 1 - t0[v0]
            t0[v2] = 0
            t0 = t0 - w
            dx = t0 @ fx
            dy = t0 @ fy
            d = dx * dx + dy * dy
            if d < dis_min:
                dis_min, dx_min, dy_min = d, dx, dy
                t = t0
        return 1.0, dx_min, dy_min, t
    v0 = -1
    if w[1] <= 0 and w[2] <= 0:
        v0 = 0
        if obt[0] == 1 and (xp - fx[0]) * (fx[2] - fx[0]) + (yp - fy[0]) * (fy[2] - fy[0]) > 0:
            v0 = 2
    elif w[2] <= 0 and w[0] <= 0:
        v0 = 1
        if obt[1] == 1 and (xp - fx[1]) * (fx[0] - fx[1]) + (yp - fy[1]) * (fy[0] - fy[1]) > 0:
            v0 = 0
    elif w[0] <= 0 and w[1] <= 0:
        v0 = 2
        if obt[2] == 1 and (xp - fx[2]) * (fx[1] - fx[2]) + (yp - fy[2]) * (fy[1] - fy[2]) > 0:
            v0 = 1
    elif w[0] <= 0:
        v0 = 1
    elif w[1] <= 0:
        v0 = 2
    elif w[2] <= 0:
        v0 = 0
    v1, v2 = (v0 + 1) % 3, (v0 + 2) % 3
    a0 = sym[v0] - sym[v1]
    t = np.zeros(3)
    t[v0] = (w @ a0 - a0[v1]) / (a0[v0] - a0[v1])
    t[v1] = 1 - t[v0]
    t[v2] = 0
    t = np.clip(t, 0.0, 1.0) - w
    dx = t @ fx
    dy = t @ fy
    return -1.0, dx, dy, t


def _sample_texture(texture, w, R, texture_type):
    if texture_type == "vertex":
        return w @ texture
    w_x = int(w[0] * R)
    w_y = int(w[1] * R)
    if (w[0] + w[1]) * R - w_x - w_y <= 1:
        return texture[w_y * R + w_x]
    return texture[(R - 1 - w_y) * R + (R - 1 - w_x)]


def golden_soft_rasterize(
    faces, textures, image_size=16, background_color=(0, 0, 0),
    near=1.0, far=100.0, eps=1e-3, sigma_val=1e-5, dist_func="euclidean",
    dist_eps=1e-4, gamma_val=1e-4, aggr_func_rgb="softmax",
    aggr_func_alpha="prod", texture_type="surface", double_side=True,
):
    """faces: [B,F,3,3]; textures: [B,F,T2,3]. Returns (rgba [B,H,W,4],
    p2f [B,F,2] normalized, aggr [B,2,H,W])."""
    B, F = faces.shape[:2]
    S = image_size
    R = int(np.sqrt(textures.shape[2])) if texture_type == "surface" else 0
    thr = np.log(1.0 / dist_eps - 1.0) * sigma_val
    rgba = np.zeros((B, S, S, 4))
    aggr = np.zeros((B, 2, S, S))
    p2f_info = np.zeros((B, F, 2))
    p2f_sum = np.zeros((B, F))
    grid = np.stack(
        np.meshgrid(np.linspace(-1, 1, S), np.linspace(-1, 1, S), indexing="xy"),
        axis=-1,
    )  # [S,S,2] (x,y); grid[row,col]

    for b in range(B):
        infos = [_face_info(faces[b, f]) for f in range(F)]
        for row in range(S):
            for col in range(S):
                xp = (2 * col + 1 - S) / S
                yp = (2 * (S - 1 - row) + 1 - S) / S
                soft_color = np.array([1.0, 1.0, 1.0, 0.0])
                if aggr_func_alpha == "prod":
                    soft_color[3] = 1.0
                softmax_sum = np.exp(eps / gamma_val)
                softmax_max = eps
                soft_color[:3] = np.array(background_color)
                if aggr_func_rgb == "softmax":
                    soft_color[:3] *= softmax_sum
                depth_min, face_idx_min = 1e7, -1

                for f in range(F):
                    face = faces[b, f]
                    inv, sym, obt, nondegen = infos[f]
                    if not nondegen:
                        continue
                    fx, fy = face[:, 0], face[:, 1]
                    if (xp > fx.max() + np.sqrt(thr) or xp < fx.min() - np.sqrt(thr)
                            or yp > fy.max() + np.sqrt(thr)
                            or yp < fy.min() - np.sqrt(thr)):
                        continue
                    w = inv @ np.array([xp, yp, 1.0])
                    if dist_func == "hard":
                        frag = 1.0 if np.all((w >= 0) & (w <= 1)) else 0.0
                        if frag == 0.0:
                            continue
                    elif dist_func == "barycentric":
                        dmin = min(w)
                        dis = dmin ** 2 if dmin > 0 else -(dmin ** 2)
                        if -dis >= thr:
                            continue
                        frag = 1.0 / (1.0 + np.exp(-dis / sigma_val))
                    else:
                        sign, dx, dy, _ = _euclidean(w, face, sym, obt, xp, yp)
                        dis = dx * dx + dy * dy
                        if sign < 0 and dis >= thr:
                            continue
                        x = np.clip(sign * dis / sigma_val, -500, 500)
                        frag = 1.0 / (1.0 + np.exp(-x))

                    if aggr_func_alpha == "hard":
                        if frag > 0.5:
                            soft_color[3] = 1.0
                    elif aggr_func_alpha == "sum":
                        soft_color[3] += frag
                    else:
                        soft_color[3] *= 1.0 - frag

                    wc = np.clip(w, 1e-5, 1 - 1e-5)
                    wc = wc / max(wc.sum(), 1e-5)
                    zp = 1.0 / (wc[0] / face[0, 2] + wc[1] / face[1, 2]
                                + wc[2] / face[2, 2])
                    if zp < near or zp > far:
                        continue

                    frontside = (
                        (fy[2] - fy[0]) * (fx[1] - fx[0])
                        < (fy[1] - fy[0]) * (fx[2] - fx[0])
                    )
                    if aggr_func_rgb == "hard":
                        inside = np.all((w >= 0) & (w <= 1))
                        if zp < depth_min and inside and (double_side or frontside):
                            depth_min = zp
                            face_idx_min = f
                            soft_color[:3] = _sample_texture(
                                textures[b, f], wc, R, texture_type
                            )
                    else:
                        if frontside or double_side:
                            z_norm = (far - zp) / (far - near)
                            exp_delta = 1.0
                            if z_norm > softmax_max:
                                exp_delta = np.exp((softmax_max - z_norm) / gamma_val)
                                softmax_max = z_norm
                            exp_z = np.exp((z_norm - softmax_max) / gamma_val)
                            softmax_sum = exp_delta * softmax_sum + exp_z * frag
                            p2f_info[b, f] += exp_z * frag * grid[row, col]
                            p2f_sum[b, f] += exp_z * frag
                            color = _sample_texture(textures[b, f], wc, R, texture_type)
                            soft_color[:3] = (
                                exp_delta * soft_color[:3] + exp_z * frag * color
                            )

                if aggr_func_alpha == "sum":
                    rgba[b, row, col, 3] = soft_color[3] / F
                elif aggr_func_alpha == "prod":
                    rgba[b, row, col, 3] = 1.0 - soft_color[3]
                else:
                    rgba[b, row, col, 3] = soft_color[3]

                if aggr_func_rgb == "hard":
                    if face_idx_min != -1:
                        rgba[b, row, col, :3] = soft_color[:3]
                    else:
                        rgba[b, row, col, :3] = background_color
                    aggr[b, 0, row, col] = depth_min
                    aggr[b, 1, row, col] = face_idx_min
                else:
                    rgba[b, row, col, :3] = soft_color[:3] / softmax_sum
                    aggr[b, 0, row, col] = softmax_sum
                    aggr[b, 1, row, col] = softmax_max

    p2f = p2f_info / np.maximum(p2f_sum[..., None], 1e-12)
    return rgba, p2f, aggr


def golden_soft_rasterize_backward(
    faces, textures, soft_colors, aggrs, grad_soft_colors,
    image_size=16, near=1.0, far=100.0, eps=1e-3, sigma_val=1e-5,
    dist_func="euclidean", dist_eps=1e-4, gamma_val=1e-4,
    aggr_func_rgb="softmax", aggr_func_alpha="prod",
    texture_type="surface", double_side=True,
):
    """Literal numpy port of backward_soft_rasterize_cuda_kernel
    (soft_rasterize_cuda_kernel.cu:479-656). soft_colors/grad: [B,H,W,4]
    channel-last; aggrs: [B,2,H,W]."""
    B, F = faces.shape[:2]
    S = image_size
    R = int(np.sqrt(textures.shape[2])) if texture_type == "surface" else 0
    thr = np.log(1.0 / dist_eps - 1.0) * sigma_val
    grad_faces = np.zeros_like(faces)
    grad_textures = np.zeros_like(textures)

    for b in range(B):
        infos = [_face_info(faces[b, f]) for f in range(F)]
        for row in range(S):
            for col in range(S):
                xp = (2 * col + 1 - S) / S
                yp = (2 * (S - 1 - row) + 1 - S) / S
                softmax_sum = aggrs[b, 0, row, col]
                softmax_max = aggrs[b, 1, row, col]
                for f in range(F):
                    face = faces[b, f]
                    inv, sym, obt, nondegen = infos[f]
                    if not nondegen:
                        continue
                    fx, fy = face[:, 0], face[:, 1]
                    if (xp > fx.max() + np.sqrt(thr)
                            or xp < fx.min() - np.sqrt(thr)
                            or yp > fy.max() + np.sqrt(thr)
                            or yp < fy.min() - np.sqrt(thr)):
                        continue
                    w = inv @ np.array([xp, yp, 1.0])
                    if dist_func == "euclidean":
                        sign, dx, dy, tt = _euclidean(w, face, sym, obt, xp, yp)
                        dis = dx * dx + dy * dy
                        if sign < 0 and dis >= thr:
                            continue
                        xarg = np.clip(sign * dis / sigma_val, -500, 500)
                        frag = 1.0 / (1.0 + np.exp(-xarg))
                    else:
                        raise NotImplementedError
                    grad_v = np.zeros((3, 3))
                    C_grad_xy = 0.0
                    # alpha (prod)
                    C_alpha = grad_soft_colors[b, row, col, 3]
                    C_alpha *= (1 - soft_colors[b, row, col, 3]) / max(
                        1 - frag, 1e-6
                    )
                    C_grad_xy += C_alpha

                    w0 = w.copy()
                    wc = np.clip(w, 1e-5, 1 - 1e-5)
                    wc = wc / max(wc.sum(), 1e-5)
                    zp = 1.0 / (wc[0] / face[0, 2] + wc[1] / face[1, 2]
                                + wc[2] / face[2, 2])
                    if zp < near or zp > far:
                        continue
                    frontside = (
                        (fy[2] - fy[0]) * (fx[1] - fx[0])
                        < (fy[1] - fy[0]) * (fx[2] - fx[0])
                    )
                    if aggr_func_rgb == "softmax" and (frontside or double_side):
                        C_rgb = 0.0
                        z_norm = (far - zp) / (far - near)
                        zps = frag * np.exp(
                            (z_norm - softmax_max) / gamma_val
                        ) / softmax_sum
                        for k in range(3):
                            gk = grad_soft_colors[b, row, col, k]
                            # texture grad
                            w_x = int(wc[0] * R)
                            w_y = int(wc[1] * R)
                            if (wc[0] + wc[1]) * R - w_x - w_y <= 1:
                                ti = w_y * R + w_x
                            else:
                                ti = (R - 1 - w_y) * R + (R - 1 - w_x)
                            grad_textures[b, f, ti, k] += zps * gk
                            color_k = textures[b, f][ti, k]
                            C_rgb += gk * (color_k - soft_colors[b, row, col, k])
                        C_rgb *= zps
                        C_grad_xy += C_rgb / max(frag, 1e-30)
                        C_z = C_rgb / gamma_val / (near - far) * zp * zp
                        grad_v[0][2] = C_z * wc[0] / face[0, 2] ** 2
                        grad_v[1][2] = C_z * wc[1] / face[1, 2] ** 2
                        grad_v[2][2] = C_z * wc[2] / face[2, 2] ** 2

                    C_grad_xy *= frag * (1 - frag) / sigma_val
                    for k in range(3):
                        grad_v[k][0] += 2 * sign * C_grad_xy * (tt[k] + w0[k]) * dx
                        grad_v[k][1] += 2 * sign * C_grad_xy * (tt[k] + w0[k]) * dy
                    grad_faces[b, f] += grad_v
    return grad_faces, grad_textures
