# Golden-fixture generator: runs the REFERENCE implementation on real tick
# series and dumps its wide brick table for the Scala golden tests.
# Output schema matches graft.operators.BrickRow (datetime_us = epoch us).
import sys, types
import numpy as np, pandas as pd
sys.modules['mplfinance'] = types.ModuleType('mplfinance')
sys.path.insert(0, '/root/reference/src')
from renkodf import Renko

OUT = '/root/repo/src/test/resources/golden'

def dump(df_renko, symbol, path):
    out = df_renko.reset_index(drop=True).copy()
    out['datetime_us'] = pd.DatetimeIndex(out['datetime'].astype('datetime64[us]')).asi8
    out.insert(0, 'symbol', symbol)
    cols = ['symbol', 'datetime_us', 'open', 'high', 'low', 'close', 'volume',
            'direction', 'is_reversal', 'tick_index_open', 'tick_index_close',
            'normal_high', 'normal_low', 'nongap_open',
            'reverse_nongap_open', 'reverse_fake_nongap_open',
            'reverse_high', 'reverse_low', 'fake_high', 'fake_low']
    out[cols].to_parquet(path, index=False)
    print(path, len(out))

def run(df, bs):
    return Renko(df.copy(), bs, divide_by=1)._df_renko

# 1. EURGBP 230k ticks, brick 0.0003 (reference's own flagship workload)
eg = pd.read_parquet('/root/reference/examples/data/EURGBP_T1_cT.parquet')
eg = eg.rename(columns={'bid': 'close'})[['close']]
dump(run(eg, 0.0003), '', f'{OUT}/eurgbp_wide.parquet')

# 2. US30 57.6k ticks, brick 5
us = pd.read_parquet('/root/reference/examples/data/US30_T1_cT.parquet')
us = us.rename(columns={'bid': 'close'})[['close']]
dump(run(us, 5), '', f'{OUT}/us30_wide.parquet')

# 3. events sf0.001 as ticks (ts -> datetime, value -> close), brick 25
ev = pd.read_parquet('/root/testdata/sf0.001/events.parquet')
ev = ev.sort_values('ts')
t = pd.DataFrame({'close': ev['value'].to_numpy()},
                 index=pd.DatetimeIndex(ev['ts'].astype('datetime64[us]')))
dump(run(t, 25.0), '', f'{OUT}/events_sf0001_b25_wide.parquet')

# 4. multi-series: one independent scan per event_type, brick 25
parts = []
for sym, g in ev.groupby('event_type'):
    g = g.sort_values('ts')
    tg = pd.DataFrame({'close': g['value'].to_numpy()},
                      index=pd.DatetimeIndex(g['ts'].astype('datetime64[us]')))
    w = run(tg, 25.0).reset_index(drop=True)
    w['datetime_us'] = pd.DatetimeIndex(w['datetime'].astype('datetime64[us]')).asi8
    w.insert(0, 'symbol', sym)
    parts.append(w)
allp = pd.concat(parts)
cols = ['symbol', 'datetime_us', 'open', 'high', 'low', 'close', 'volume',
        'direction', 'is_reversal', 'tick_index_open', 'tick_index_close',
        'normal_high', 'normal_low', 'nongap_open',
        'reverse_nongap_open', 'reverse_fake_nongap_open',
        'reverse_high', 'reverse_low', 'fake_high', 'fake_low']
allp[cols].to_parquet(f'{OUT}/events_sf0001_b25_bytype_wide.parquet', index=False)
print(f'{OUT}/events_sf0001_b25_bytype_wide.parquet', len(allp))
