# Runs the reference implementation on hand-checkable micro series and prints
# exact expected wide-table values for the Scala unit tests.
import sys, types, numpy as np, pandas as pd
sys.modules['mplfinance'] = types.ModuleType('mplfinance')  # plotting unused
sys.path.insert(0, '/root/reference/src')
from renkodf import Renko

def run(name, prices, bs, drop=True):
    ts = pd.date_range('2023-01-01', periods=len(prices), freq='1min')
    df = pd.DataFrame({'close': prices}, index=ts)
    r = Renko(df.copy(), bs)
    wide = r._df_renko
    print(f'== {name} bricks={len(wide)} anchor={(prices[0] // bs) * bs!r}')
    for _, row in wide.iterrows():
        print('  ', {c: (row[c] if not isinstance(row[c], pd.Timestamp) else str(row[c])) for c in wide.columns})

run('gap', [10.0, 10.0, 10.4, 11.05, 13.6], 1.0)
run('reversal_2brick', [10.0, 10.2, 11.05, 12.01, 10.3, 10.05, 9.99], 1.0)
run('reversal_gap', [10.0, 11.05, 12.01, 8.5], 1.0)
run('opposite_small_nogap', [10.0, 11.05, 10.3, 10.9, 12.05], 1.0)
run('first_tick_gap_empty', [10.0, 13.7], 1.0)
run('anchor_frac', [10.47, 10.9, 11.15, 9.4], 0.25)
run('wick_nongap', [10.0, 9.3, 11.2, 12.6, 11.9, 9.9], 1.0)
