"""An independent NumPy/torch oracle implementing the reference math.

This transcribes the formulas of the reference's optimization core
(worker.py:109-315, optimizers.py, utils.py:285-304) into NumPy, with torch
(CPU) providing the conv forward/backward — a fully independent compute path
from the JAX engine. Golden tests run both for N iterations on identical
inputs and assert trace parity (SURVEY.md §4.1).

Branch evaluation order follows network (blob) order, matching the engine.
"""

from collections import OrderedDict

import numpy as np
import torch
import torch.nn.functional as F

BLOB_NAMES = ('data',
              'conv1_1', 'conv1_2', 'pool1',
              'conv2_1', 'conv2_2', 'pool2',
              'conv3_1', 'conv3_2', 'conv3_3', 'conv3_4', 'pool3',
              'conv4_1', 'conv4_2', 'conv4_3', 'conv4_4', 'pool4',
              'conv5_1', 'conv5_2', 'conv5_3', 'conv5_4', 'pool5')

MEAN = np.float32([123.68, 116.779, 103.939]).reshape(3, 1, 1)


class OracleVGG:
    """Truncated VGG-19 on torch CPU, NCHW, Caffe semantics (post-ReLU taps,
    ceil-mode pooling)."""

    def __init__(self, params_hwio):
        self.weights = {}
        for name, p in params_hwio.items():
            w = np.ascontiguousarray(np.transpose(np.float32(p['w']), (3, 2, 0, 1)))
            self.weights[name] = (torch.from_numpy(w),
                                  torch.from_numpy(np.float32(p['b'])))

    def preprocess(self, image_hwc):
        arr = np.float32(image_hwc).transpose(2, 0, 1) - MEAN
        return arr[None]

    def deprocess(self, x):
        return (x.squeeze(0) + MEAN).transpose(1, 2, 0)

    def _run(self, x, deepest, need_grad=False):
        t = torch.from_numpy(np.float32(x))
        if need_grad:
            t = t.requires_grad_(True)
        feats = OrderedDict()
        feats['data'] = t
        h = t
        for name in BLOB_NAMES[1:]:
            if BLOB_NAMES.index(name) > deepest:
                break
            if name.startswith('conv'):
                w, b = self.weights[name]
                h = F.conv2d(h, w, b, padding=1)
                h = F.relu(h)
            else:
                h = F.max_pool2d(h, 2, 2, ceil_mode=True)
            feats[name] = h
        return t, feats

    def forward(self, x, layers=None):
        layers = list(layers) if layers is not None else list(BLOB_NAMES)
        deepest = max(BLOB_NAMES.index(l) for l in layers)
        with torch.no_grad():
            _, feats = self._run(x, deepest)
        return {l: feats[l].numpy().copy() for l in layers}

    def forward_backward(self, x, layers):
        """Returns (features dict, backward fn). backward(diffs) gives the
        input gradient for injected per-layer cotangents — the analog of
        Caffe's sectioned backward (reference worker.py:88-106)."""
        layers = list(layers)
        deepest = max(BLOB_NAMES.index(l) for l in layers)
        t, feats = self._run(x, deepest, need_grad=True)
        out = {l: feats[l].detach().numpy().copy() for l in layers}

        def backward(diffs):
            total = None
            for l in layers:
                d = torch.from_numpy(np.float32(diffs[l]))
                term = (feats[l] * d).sum()
                total = term if total is None else total + term
            grad = torch.autograd.grad(total, t, retain_graph=False)[0]
            return grad.numpy().copy()

        return out, backward


def gram_matrix(x):
    n, c, h, w = x.shape
    assert n == 1
    flat = x.reshape(c, h * w)
    return np.dot(flat, flat.T) / np.float32(flat.size)


def tv_norm(x, beta=2.0):
    x_diff = x - np.roll(x, -1, axis=3)
    y_diff = x - np.roll(x, -1, axis=2)
    grad_norm2 = x_diff ** 2 + y_diff ** 2 + np.float32(1e-8)
    norm = np.sum(grad_norm2 ** (beta / 2))
    dgrad_norm = (beta / 2) * grad_norm2 ** (beta / 2 - 1)
    dx_diff = 2 * x_diff * dgrad_norm
    dy_diff = 2 * y_diff * dgrad_norm
    grad = dx_diff + dy_diff
    grad -= np.roll(dx_diff, 1, axis=3)
    grad -= np.roll(dy_diff, 1, axis=2)
    return norm, grad


def p_norm(x, p=2.0):
    norm = np.sum(np.abs(x) ** p) / p
    grad = np.sign(x) * np.abs(x) ** (p - 1)
    return norm, grad


def rms(x):
    return np.sqrt(np.mean(np.asarray(x, np.float64) ** 2))


class OracleDecayingMean:
    def __init__(self, decay=0.9):
        self.mean = 0
        self.decay = decay
        self.items = 0

    def __call__(self, item=None):
        if item is not None:
            self.mean = self.decay * self.mean + (1 - self.decay) * item
            self.items += 1
        if self.items == 0:
            return self.mean
        return self.mean / (1 - self.decay ** self.items)

    def clear(self):
        self.mean = 0
        self.items = 0


class OracleAdam:
    def __init__(self, x, opfunc, step_size=1, b1=0.9, b2=0.999):
        self.x = x
        self.opfunc = opfunc
        self.step_size = step_size
        self.t = 0
        self.g1 = OracleDecayingMean(b1)
        self.g2 = OracleDecayingMean(b2)

    def step(self):
        self.t += 1
        loss, grad = self.opfunc(self.x)
        self.g1(grad)
        self.g2(grad ** 2)
        self.x = self.x - self.step_size * self.g1() / (np.sqrt(self.g2()) + 1e-8)
        return self.x, loss

    def objective_changed(self):
        self.t = 0
        self.g1.clear()


class OracleLBFGS:
    def __init__(self, x, opfunc, step_size=1, n_corr=10):
        self.x = x
        self.opfunc = opfunc
        self.step_size = step_size
        self.n_corr = n_corr
        self.loss = None
        self.grad = None
        self.sk, self.yk, self.syk = [], [], []

    @staticmethod
    def dot(a, b):
        return np.float32(np.dot(a.ravel(), b.ravel()))

    def step(self):
        if self.loss is None:
            self.loss, self.grad = self.opfunc(self.x)
        s = -self.step_size * self.inv_hv(self.grad.copy())
        self.x = self.x + s
        loss, grad = self.opfunc(self.x)
        y = grad - self.grad
        self.store_curvature_pair(s, y)
        self.loss, self.grad = loss, grad
        return self.x, loss

    def store_curvature_pair(self, s, y):
        sy = self.dot(s, y)
        if sy > 1e-10:
            self.sk.append(s)
            self.yk.append(y)
            self.syk.append(sy)
        if len(self.sk) > self.n_corr:
            self.sk, self.yk, self.syk = self.sk[1:], self.yk[1:], self.syk[1:]

    def inv_hv(self, p):
        alphas = []
        for s, y, sy in zip(reversed(self.sk), reversed(self.yk),
                            reversed(self.syk)):
            alphas.append(self.dot(s, p) / sy)
            p = p - alphas[-1] * y
        if self.sk:
            sy, y = self.syk[-1], self.yk[-1]
            p = p * (sy / self.dot(y, y))
        else:
            p = p / np.sqrt(self.dot(p, p) / p.size)
        for s, y, sy, alpha in zip(self.sk, self.yk, self.syk,
                                   reversed(alphas)):
            beta = self.dot(y, p) / sy
            p = p + (alpha - beta) * s
        return p

    def objective_changed(self):
        self.sk, self.yk, self.syk = [], [], []
        self.loss, self.grad = None, None


class OracleTransfer:
    """Reference-math style transfer: NCHW NumPy around the torch VGG."""

    def __init__(self, params_hwio, weights, scalar_params,
                 optimizer='adam', step_size=None, n_corr=10):
        self.model = OracleVGG(params_hwio)
        self.weights = weights
        self.scalar_params = scalar_params
        self.optimizer_name = optimizer
        self.step_size = step_size if step_size is not None else \
            {'adam': 10.0, 'lbfgs': 1.0}[optimizer]
        self.n_corr = n_corr
        self.norms = {k: {} for k in 'csd'}
        self.features = None
        self.grams = None
        self.x = None
        self.optimizer = None
        self.t = 0
        self.traces = []

    def active_branches(self):
        branches = []
        for layer in BLOB_NAMES:
            has = []
            for loss_name in ('content', 'style', 'deepdream'):
                w = self.weights.get(loss_name, {}).get(layer, 0.0)
                has.append(abs(float(w)) > 1e-15)
            if any(has):
                branches.append((layer, has[0], has[1], has[2]))
        return branches

    def set_content(self, image_hwc):
        content = self.model.preprocess(image_hwc)
        self.features = self.model.forward(content)

    def set_style(self, image_hwc):
        x = self.model.preprocess(image_hwc)
        feats = self.model.forward(x)
        self.grams = {l: gram_matrix(f) for l, f in feats.items()}

    def set_input(self, image_hwc):
        self.x = self.model.preprocess(image_hwc)
        self.reset()

    def reset(self):
        self.norms = {k: {} for k in 'csd'}
        self.t = 0
        cls = OracleAdam if self.optimizer_name == 'adam' else OracleLBFGS
        self.optimizer = cls(self.x, self.opfunc, step_size=self.step_size)

    def opfunc(self, x):
        branches = self.active_branches()
        layers = [b[0] for b in branches]
        feats, backward = self.model.forward_backward(x, layers)
        trace = OrderedDict()

        def record(name, value):
            while name in trace:
                name += '_'
            trace[name] = float(value)
            return value

        loss = np.float32(0.0)
        diffs = {}
        for layer, has_c, has_s, has_d in branches:
            feat = feats[layer]
            w = self.weights
            diff = np.zeros_like(feat)
            if has_c:
                cw = np.float32(w['content'][layer])
                c_diff = feat - self.features[layer]
                c_grad = (2.0 / c_diff.size) * c_diff
                if layer not in self.norms['c']:
                    self.norms['c'][layer] = np.sqrt(np.mean(c_grad ** 2))
                cn = self.norms['c'][layer]
                loss += record('%s_c_loss' % layer, cw * np.mean(c_diff ** 2) / cn)
                term = cw * c_grad / cn
                record('%s_c_grad' % layer, rms(term))
                diff += term
            if has_s:
                sw = np.float32(w['style'][layer])
                _, n, mh, mw = feat.shape
                gram_diff = gram_matrix(feat) - self.grams[layer]
                flat = feat.reshape(n, mh * mw)
                s_grad = np.dot(gram_diff, flat).reshape(1, n, mh, mw)
                s_grad = s_grad * (2.0 / (gram_diff.size * flat.size))
                if layer not in self.norms['s']:
                    self.norms['s'][layer] = np.sqrt(np.mean(s_grad ** 2))
                sn = self.norms['s'][layer]
                loss += record('%s_s_loss' % layer,
                               sw * np.mean(gram_diff ** 2) / sn)
                term = (sw / sn) * s_grad
                record('%s_s_grad' % layer, rms(term))
                diff += term
            if has_d:
                dw = np.float32(w['deepdream'][layer])
                d_grad = (-2.0 / feat.size) * feat
                if layer not in self.norms['d']:
                    self.norms['d'][layer] = np.sqrt(np.mean(d_grad ** 2))
                dn = self.norms['d'][layer]
                loss += record('%s_d_loss' % layer,
                               -dw * np.mean(feat ** 2) / dn)
                term = dw * d_grad / dn
                record('%s_d_grad' % layer, rms(term))
                diff += term
            diffs[layer] = diff

        record('scd_loss', loss)
        xs = x / np.float32(255.0)
        tv_loss, tv_grad = tv_norm(xs, self.scalar_params['tv_power'])
        loss += record('t_loss', self.scalar_params['tv'] * tv_loss)
        p_loss, p_grad = p_norm(xs, self.scalar_params['p_power'])
        loss += record('p_loss', self.scalar_params['p'] * p_loss)

        grad = backward(diffs)
        record('scd_grad', rms(grad))
        tv_term = self.scalar_params['tv'] * tv_grad
        record('t_grad', rms(tv_term))
        grad = grad + tv_term
        p_term = self.scalar_params['p'] * p_grad
        record('p_grad', rms(p_term))
        grad = grad + p_term

        record('loss', loss)
        record('grad', rms(grad))
        self.traces.append(trace)
        return np.float32(loss), np.float32(grad)

    def step(self):
        self.t += 1
        x, _ = self.optimizer.step()
        self.x = x
        trace = self.traces[-1]
        trace['fevals'] = self.t
        return self.model.deprocess(x), trace
