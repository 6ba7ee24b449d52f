"""Generate golden G2P fixtures by running the REFERENCE front-end.

Run once against /root/reference; outputs tests/fixtures/frontend_goldens.json.
The new framework's frontend must reproduce these outputs exactly.
"""

import json
import os
import sys

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
sys.path.insert(0, REF)

from VISinger.text_normalizers.text_normalizer import TextNormalizer  # noqa: E402
from VISinger.text_normalizers.number_normalizer import NumberNormalizer  # noqa: E402
from VISinger.text_normalizers.symbol_normalizer import SymbolNormalizer  # noqa: E402

TEXTS = [
    "长亭外古道边",
    "长亭外SPAP古道边",
    "我家住在，黄土，，高坡。。。啊！？，这不是一本书<沃尔>，《易筋经》。@#￥%%第三方！水电费、",
    "啊,你是我最心爱的姑娘AP",
    "你好世界",
    "春天的花开秋天的风",
    "以及冬天的落阳",
    "忧郁的青春年少的我",
    "曾经无知的这么想",
    "风车在四季轮回的歌里它天天的流转",
    "风花雪月的诗句里我在年年的成长",
    "宁静的夏天天空中繁星点点",
    "知了也睡了安心的睡了",
    "现在123.3%是2019年",
    "美国911事件，110我拨打的是电话110",
    "比分11:34不错",
    # "气温-3度到5度" — the reference CRASHES on negative numbers
    # (number_normalizer.py:108 TypeError); our fix is tested separately.
    "20年前公元709年他活了109年现在110岁",
    "小小的天有大大的梦想",
    "重重的壳裹着轻轻的仰望",
    "银行行长在长安街上行走",  # polyphone stress test: 行/长/重
    "音乐快乐的乐章",
    "還有繁體字測試",  # traditional chars
    "卡拉OK和ABC混排",
]

mono = os.path.join(REF, "text_normalizers/data/monosyllable.csv")
poly = os.path.join(REF, "text_normalizers/data/polyphone.csv")
tn = TextNormalizer(mono, poly)
nn = NumberNormalizer()
sn = SymbolNormalizer()

goldens = {
    "normalize": {t: tn.normalize(t) for t in TEXTS},
    "numbers": {t: nn.normalize(t) for t in TEXTS},
    "symbols": {t: sn.normalize(nn.normalize(t.lower())) for t in TEXTS},
    # jieba word segmentation + '#' joins + normalize_sharp collapse
    # (text_normalizer.py:32-46 with word_parse=True)
    "normalize_word_parse": {t: tn.normalize(t, word_parse=True)
                             for t in TEXTS},
}

out = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "frontend_goldens.json")
os.makedirs(os.path.dirname(out), exist_ok=True)
with open(out, "w", encoding="utf-8") as f:
    json.dump(goldens, f, ensure_ascii=False, indent=1)
print("wrote", out, "with", len(TEXTS), "texts")
