# Streaming golden fixtures: runs the reference RenkoWS event-by-event.
import sys, types
import numpy as np, pandas as pd
sys.modules['mplfinance'] = types.ModuleType('mplfinance')
sys.path.insert(0, '/root/reference/src')
from renkodf import Renko, RenkoWS

OUT = '/root/repo/src/test/resources/golden'
WS_COLS = ['timestamp', 'open', 'high', 'low', 'close', 'volume',
           'direction', 'is_reversal', 'normal_high', 'normal_low',
           'nongap_open', 'reverse_nongap_open', 'reverse_fake_nongap_open',
           'reverse_high', 'reverse_low', 'fake_high', 'fake_low']

us = pd.read_parquet('/root/reference/examples/data/US30_T1_cT.parquet')
us = us.rename(columns={'bid': 'close'})
us['timestamp'] = pd.DatetimeIndex(us.index).asi8  # us

ts = us['timestamp'].to_numpy(); px = us['close'].to_numpy()

# 1. full stream replay (incl. synthetic initial row)
r = RenkoWS(ts[0], px[0], 5)
for i in range(1, len(ts)):
    r.add_prices(ts[i], px[i], gap_tolerance=1000)
full = r._df_renko.reset_index(drop=True)
full[WS_COLS].to_parquet(f'{OUT}/us30_ws_full.parquet', index=False)
print('ws_full', len(full))

# 2. animate final frames per mode (max_len=0: no destructive trim)
for mode in ['normal','wicks','nongap','reverse-wicks','reverse-nongap','fake-r-wicks','fake-r-nongap']:
    fr = r.renko_animate(mode, max_len=0).reset_index(drop=True)
    name = mode.replace('-', '_')
    fr.to_parquet(f'{OUT}/us30_animate_{name}.parquet', index=False)
    print('animate', mode, len(fr), list(fr.columns))

# 3. checkpoint/resume splice (test_ws_ext protocol: split at 2023-06-28 13:50)
split = pd.Timestamp('2023-06-28 13:50')
head = us[us.index <= split]
tail = us[us.index > split]
rh = Renko(head.copy(), 5)
ext = rh.to_rws()
n_ext = len(ext)
rws = RenkoWS(external_df=ext.copy(), ts_unit='us')
tts = tail['timestamp'].to_numpy(); tpx = tail['close'].to_numpy()
for i in range(len(tts)):
    rws.add_prices(tts[i], tpx[i], gap_tolerance=1000)
res = rws._df_renko.reset_index(drop=True)
appended = res.iloc[n_ext:]
appended[WS_COLS].to_parquet(f'{OUT}/us30_ws_resume_appended.parquet', index=False)
print('resume: ext rows', n_ext, 'appended', len(appended))
# also the checkpoint table itself for state-rehydration testing
ext2 = rh.to_rws()
ext2.to_parquet(f'{OUT}/us30_to_rws_head.parquet', index=False)
print('to_rws head cols', list(ext2.columns))
