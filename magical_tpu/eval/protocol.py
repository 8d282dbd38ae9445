"""Multi-task evaluation protocol.

Mirrors /root/reference/magical/evaluation.py: given a demo env, evaluate
a policy on the demo env and all its test variants with mean / 95% t-CI /
std aggregation, plus a LaTeX table emitter.  The t-interval is computed
directly (scipy/statsmodels-free) with the same two-sided Student-t
construction statsmodels' DescrStatsW.tconfint_mean uses.
"""

from __future__ import annotations

import abc
import collections
import io
import math
import warnings

import numpy as np


def _t_ppf(q, df):
    """Student-t quantile via the incomplete-beta inverse (good to ~1e-8;
    replicates scipy.stats.t.ppf for the CI computation)."""
    # use the relationship with the regularised incomplete beta function;
    # numerically invert with bisection (df >= 1, q in (0.5, 1)).
    if df <= 0:
        return float('nan')

    def cdf(x):
        # Student-t CDF via continued-fraction betainc
        ibt = _betainc(df / 2.0, 0.5, df / (df + x * x))
        return 1.0 - 0.5 * ibt if x > 0 else 0.5 * ibt

    lo, hi = 0.0, 1e3
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if cdf(mid) < q:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def _betainc(a, b, x):
    """Regularised incomplete beta I_x(a, b) (Lentz continued fraction)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    lbeta = (math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
             + a * math.log(x) + b * math.log(1.0 - x))
    front = math.exp(lbeta)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def _betacf(a, b, x, max_iter=200, eps=3e-14):
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < 1e-30:
        d = 1e-30
    d = 1.0 / d
    h = d
    for m in range(1, max_iter + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-30:
            d = 1e-30
        c = 1.0 + aa / c
        if abs(c) < 1e-30:
            c = 1e-30
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-30:
            d = 1e-30
        c = 1.0 + aa / c
        if abs(c) < 1e-30:
            c = 1e-30
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h


def tconfint_mean(scores, alpha=0.05):
    """DescrStatsW(scores).tconfint_mean(alpha, 'two-sided') equivalent."""
    scores = np.asarray(scores, dtype=np.float64)
    n = len(scores)
    mean = scores.mean()
    if n < 2:
        return (float('nan'), float('nan'))
    sem = scores.std(ddof=1) / math.sqrt(n)
    tq = _t_ppf(1.0 - alpha / 2.0, n - 1)
    return (mean - tq * sem, mean + tq * sem)


class EvaluationProtocol(abc.ABC):
    """evaluation.py:13-98."""
    _called_init = False

    def __init__(self, demo_env_name, n_rollouts):
        from magical_tpu.api.registry import (DEMO_ENVS_TO_TEST_ENVS_MAP,
                                              register_envs)
        register_envs()
        self.n_rollouts = n_rollouts
        self.demo_env_name = demo_env_name
        self.test_env_names = [
            demo_env_name, *DEMO_ENVS_TO_TEST_ENVS_MAP[demo_env_name]]
        self._called_init = True

    @property
    @abc.abstractmethod
    def run_id(self):
        ...

    @abc.abstractmethod
    def obtain_scores(self, env_name):
        ...

    def do_eval(self, verbose=False):
        if not self._called_init:
            raise ValueError(
                'EvaluationProtocol.__init__() was not called. Did you '
                'include a super().__init__(…) call in your subclass?')
        records = []
        for env_name in self.test_env_names:
            scores = self.obtain_scores(env_name)
            if len(scores) < self.n_rollouts:
                raise ValueError(
                    f'.obtain_scores() returned only {len(scores)} scores, '
                    f'but we asked for {self.n_rollouts} scores')
            if len(scores) > self.n_rollouts:
                warnings.warn(
                    f'Asked for {self.n_rollouts} scores but got '
                    f'{len(scores)} scores instead. Will truncate to only '
                    f'consider the first {self.n_rollouts} scores.')
                scores = scores[:self.n_rollouts]
            mean = float(np.mean(scores))
            lo, hi = tconfint_mean(scores, 0.05)
            std = float(np.std(scores, ddof=1))
            records.append(collections.OrderedDict([
                ('demo_env', self.demo_env_name),
                ('test_env', env_name),
                ('mean_score', mean),
                ('ci95_lower', lo),
                ('ci95_upper', hi),
                ('std_score', std),
                ('run_id', self.run_id),
            ]))
        try:
            import pandas as pd
            frame = pd.DataFrame.from_records(records)
        except ImportError:          # pragma: no cover
            frame = records
        if verbose:
            print(f"Final mean scores for '{self.run_id}':")
            if not isinstance(frame, list):
                print(frame[['test_env', 'mean_score', 'ci95_lower',
                             'ci95_upper']])
        return frame


def latexify_results(eval_data, id_column='run_id'):
    """evaluation.py:101-154 — LaTeX results table."""
    test_envs = eval_data['test_env'].unique()
    col_names = [r'\textbf{%s}' % e for e in test_envs]
    alg_names = eval_data[id_column].unique()
    fp = io.StringIO()
    print(r"\centering", file=fp)
    print(r"\begin{tabular}{l@{\hspace{1em}}%s}" % ("c" * len(col_names)),
          file=fp)
    print(r"\toprule", file=fp)
    print(r'\textbf{Randomisation} & ', end='', file=fp)
    print(' & '.join(col_names), end='', file=fp)
    print('\\\\', file=fp)
    print(r'\midrule', file=fp)
    for alg_name in alg_names:
        alg_mask = eval_data[id_column] == alg_name
        stat_parts = []
        for env_name in test_envs:
            full_mask = alg_mask & (eval_data['test_env'] == env_name)
            relevant_rows = list(eval_data[full_mask].iterrows())
            if len(relevant_rows) != 1:
                raise ValueError(
                    f'got {len(relevant_rows)} rows corresponding to '
                    f'{id_column}={alg_name} and test_env={env_name}, but '
                    f'expected one (maybe IDs in column {id_column} aren\'t '
                    f'unique?)')
            (_, row), = relevant_rows
            std = row['std_score']
            stat_parts.append(f'{row["mean_score"]:.2f} ($\\pm$ {std:.2f})')
        print(r'\textbf{%s} & ' % alg_name, end='', file=fp)
        print(' & '.join(stat_parts), end='', file=fp)
        print('\\\\', file=fp)
        print(r'\bottomrule', file=fp)
        print(r'\end{tabular}', file=fp)
    return fp.getvalue()
