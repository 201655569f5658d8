"""Polyphone inventory + realization lexicon for Mandarin g2p.

``INVENTORY`` is the reference's BERT-polyphone class inventory — 159
polyphonic characters / 391 readings (derived from
`/root/reference/models/tts/maskgct/g2p/sources/g2p_chinese_model/
polydict.json`, a fixed linguistic class map; their ü-notation
jv/qv/xv/yv is normalized to standard pinyin ju/qu/xu/yu). It grounds
our rule+lexicon g2p the same way it grounds the reference's
classifier: every char must carry its full reading set, and
`tests/test_polyphone_inventory.py` asserts each reading is actually
REALIZABLE by the g2p in some context (word lexicon, context rule, or
char default).

``POLY_WORDS`` is the curated realization lexicon: for every non-default
reading, at least one common word/name that selects it. Merged into the
word lexicon consulted by `mandarin.chinese_to_pinyin` (after the
caller's lexicon, before char defaults).

``POLY_CHAR_DEFAULTS`` supplies default readings for inventory chars
missing from the frequency-ranked CHAR_PINYIN table.

``UNREALIZED`` documents inventory readings with no standard word-level
realization (neutral-tone allophones the BERT labels distinguish, plus
a few nonstandard/dialect variants) — excluded from the coverage
assertion with the reason recorded here.
"""

INVENTORY: dict[str, tuple[str, ...]] = {
    "丧": ("sang1", "sang4"),
    "中": ("zhong1", "zhong4"),
    "为": ("wei2", "wei4"),
    "乌": ("wu1", "wu4"),
    "乐": ("lao4", "le4", "le5", "yao4", "yue4"),
    "了": ("le5", "liao3", "liao5"),
    "什": ("shen2", "shi2"),
    "仔": ("zai3", "zai5", "zi3", "zi5"),
    "令": ("ling2", "ling4"),
    "任": ("ren2", "ren4"),
    "会": ("hui4", "hui5", "kuai4"),
    "传": ("chuan2", "zhuan4"),
    "佛": ("fo2", "fu2"),
    "供": ("gong1", "gong4"),
    "便": ("bian4", "pian2"),
    "倒": ("dao3", "dao4"),
    "假": ("jia3", "jia4"),
    "兴": ("xing1", "xing4"),
    "冠": ("guan1", "guan4"),
    "冲": ("chong1", "chong4"),
    "几": ("ji1", "ji2", "ji3"),
    "分": ("fen1", "fen4", "fen5"),
    "切": ("qie1", "qie4"),
    "划": ("hua2", "hua4", "hua5"),
    "创": ("chuang1", "chuang4"),
    "剥": ("bao1", "bo1"),
    "勒": ("le4", "le5", "lei1"),
    "区": ("ou1", "qu1"),
    "华": ("hua2", "hua4"),
    "单": ("chan2", "dan1", "shan4"),
    "卜": ("bo5", "bu3"),
    "占": ("zhan1", "zhan4"),
    "卡": ("ka2", "ka3", "qia3"),
    "卷": ("juan3", "juan4"),
    "厦": ("sha4", "xia4"),
    "参": ("can1", "cen1", "shen1"),
    "发": ("fa1", "fa4", "fa5"),
    "只": ("zhi1", "zhi3"),
    "号": ("hao2", "hao4", "hao5"),
    "同": ("tong2", "tong4", "tong5"),
    "吐": ("tu2", "tu3", "tu4"),
    "和": ("he2", "he4", "he5", "huo2", "huo4", "huo5"),
    "喝": ("he1", "he4"),
    "圈": ("juan4", "quan1", "quan5"),
    "地": ("de5", "di4", "di5"),
    "塞": ("sai1", "sai2", "sai4", "se4"),
    "壳": ("ke2", "qiao4"),
    "处": ("chu3", "chu4"),
    "奇": ("ji1", "qi2"),
    "奔": ("ben1", "ben4"),
    "好": ("hao3", "hao4", "hao5"),
    "宁": ("ning2", "ning4", "ning5"),
    "宿": ("su4", "xiu3", "xiu4"),
    "将": ("jiang1", "jiang4"),
    "少": ("shao3", "shao4"),
    "尽": ("jin3", "jin4"),
    "岗": ("gang1", "gang3"),
    "差": ("cha1", "cha4", "chai1", "ci1"),
    "巷": ("hang4", "xiang4"),
    "帖": ("tie1", "tie3", "tie4"),
    "干": ("gan1", "gan4"),
    "应": ("ying1", "ying4", "ying5"),
    "度": ("du4", "du5", "duo2"),
    "弹": ("dan4", "tan2", "tan5"),
    "强": ("jiang4", "qiang2", "qiang3"),
    "当": ("dang1", "dang4", "dang5"),
    "待": ("dai1", "dai4"),
    "得": ("de2", "de5", "dei3", "dei5"),
    "恶": ("e3", "e4", "wu4"),
    "扁": ("bian3", "pian1"),
    "扇": ("shan1", "shan4"),
    "扎": ("za1", "zha1", "zha2"),
    "扫": ("sao3", "sao4"),
    "担": ("dan1", "dan4", "dan5"),
    "挑": ("tiao1", "tiao3"),
    "据": ("ju1", "ju4"),
    "撒": ("sa1", "sa3", "sa5"),
    "教": ("jiao1", "jiao4"),
    "散": ("san3", "san4", "san5"),
    "数": ("shu3", "shu4", "shu5"),
    "斗": ("dou3", "dou4"),
    "晃": ("huang3",),
    "曝": ("bao4",),
    "曲": ("qu1", "qu3"),
    "更": ("geng1", "geng4"),
    "曾": ("ceng1", "ceng2", "zeng1"),
    "朝": ("chao2", "zhao1"),
    "朴": ("piao2", "pu2", "pu3"),
    "杆": ("gan1", "gan3"),
    "查": ("cha2", "zha1"),
    "校": ("jiao4", "xiao4"),
    "模": ("mo2", "mu2"),
    "横": ("heng2", "heng4"),
    "没": ("mei2", "mo4"),
    "泡": ("pao1", "pao4", "pao5"),
    "济": ("ji3", "ji4"),
    "混": ("hun2", "hun3", "hun4", "hun5"),
    "漂": ("piao1", "piao3", "piao4"),
    "炸": ("zha2", "zha4"),
    "熟": ("shou2", "shu2"),
    "燕": ("yan1", "yan4"),
    "片": ("pian1", "pian4"),
    "率": ("lv4", "shuai4"),
    "畜": ("chu4", "xu4"),
    "的": ("de5", "di1", "di2", "di4", "di5"),
    "盛": ("cheng2", "sheng4"),
    "相": ("xiang1", "xiang4", "xiang5"),
    "省": ("sheng3", "xing3"),
    "看": ("kan1", "kan4", "kan5"),
    "着": ("zhao1", "zhao2", "zhao5", "zhe5", "zhuo2", "zhuo5"),
    "矫": ("jiao3",),
    "禁": ("jin1", "jin4"),
    "种": ("zhong3", "zhong4"),
    "称": ("chen4", "cheng1"),
    "空": ("kong1", "kong4"),
    "答": ("da1", "da2"),
    "粘": ("nian2", "zhan1"),
    "糊": ("hu2", "hu5"),
    "系": ("ji4", "xi4", "xi5"),
    "累": ("lei2", "lei3", "lei4", "lei5"),
    "纤": ("qian4", "xian1"),
    "结": ("jie1", "jie2", "jie5"),
    "给": ("gei3", "gei5", "ji3"),
    "缝": ("feng2", "feng4", "feng5"),
    "肖": ("xiao1", "xiao4"),
    "背": ("bei1", "bei4"),
    "脏": ("zang1", "zang4"),
    "舍": ("she3", "she4"),
    "色": ("se4", "shai3"),
    "落": ("lao4", "luo4"),
    "蒙": ("meng1", "meng2", "meng3"),
    "薄": ("bao2", "bo2", "bo4"),
    "藏": ("cang2", "zang4"),
    "血": ("xie3", "xue4"),
    "行": ("hang2", "hang5", "heng5", "xing2", "xing4"),
    "要": ("yao1", "yao4"),
    "观": ("guan1", "guan4"),
    "觉": ("jiao4", "jiao5", "jue2"),
    "角": ("jiao3", "jue2"),
    "解": ("jie3", "jie4", "xie4"),
    "说": ("shui4", "shuo1"),
    "调": ("diao4", "tiao2"),
    "踏": ("ta1", "ta4"),
    "车": ("che1", "ju1"),
    "转": ("zhuan3", "zhuan4"),
    "载": ("zai3", "zai4"),
    "还": ("hai2", "huan2"),
    "遂": ("sui2", "sui4"),
    "都": ("dou1", "du1"),
    "重": ("chong2", "zhong4"),
    "量": ("liang2", "liang4", "liang5"),
    "钻": ("zuan1", "zuan4"),
    "铺": ("pu1", "pu4"),
    "长": ("chang2", "chang3", "zhang3"),
    "间": ("jian1", "jian4"),
    "降": ("jiang4", "xiang2"),
    "难": ("nan2", "nan4", "nan5"),
    "露": ("lou4", "lu4"),
    "鲜": ("xian1", "xian3"),
}


# default readings for inventory chars absent from CHAR_PINYIN
POLY_CHAR_DEFAULTS: dict[str, str] = {
    "仔": "zi3",    # 仔细
    "供": "gong1",  # 提供
    "岗": "gang3",  # 岗位
    "巷": "xiang4", # 小巷
    "扁": "bian3",  # 扁平
    "曝": "bao4",   # 曝光
    "矫": "jiao3",  # 矫正
    "纤": "xian1",  # 纤维
    "肖": "xiao4",  # 肖像
}

# curated words realizing the non-default readings (reading in comments)
POLY_WORDS: dict[str, str] = {
    "丧事": "sang1 shi4", "丧礼": "sang1 li3",            # 丧 sang1
    "中奖": "zhong4 jiang3", "打中": "da3 zhong4",
    "中毒": "zhong4 du2",                                  # 中 zhong4
    "乐亭": "lao4 ting2",                                  # 乐 lao4 (place)
    "乐山乐水": "yao4 shan1 yao4 shui3",                   # 乐 yao4 (classical)
    "什锦": "shi2 jin3", "家什": "jia1 shi5",              # 什 shi2/shi5
    "牛仔": "niu2 zai3", "仔细": "zi3 xi4",                # 仔 zai3/zi3
    "令狐": "ling2 hu2",                                   # 令 ling2 (surname)
    "任丘": "ren2 qiu1", "任姓": "ren2 xing4",             # 任 ren2 (surname)
    "仿佛": "fang3 fu2",                                   # 佛 fu2
    "供应": "gong1 ying4", "提供": "ti2 gong1",
    "供奉": "gong4 feng4", "口供": "kou3 gong4",           # 供 gong1/gong4
    "冠军": "guan4 jun1", "夺冠": "duo2 guan4",            # 冠 guan4
    "冲着": "chong4 zhe5", "冲劲": "chong4 jin4",          # 冲 chong4
    "划船": "hua2 chuan2", "划算": "hua2 suan4",
    "比划": "bi3 hua5",                                    # 划 hua2/hua5
    "创伤": "chuang1 shang1", "重创": "zhong4 chuang1",    # 创 chuang1
    "剥皮": "bao1 pi2",                                    # 剥 bao1
    "勒紧": "lei1 jin3",                                   # 勒 lei1
    "区氏": "ou1 shi4",                                    # 区 ou1 (surname)
    "华山": "hua4 shan1",                                  # 华 hua4
    "单县": "shan4 xian4", "单姓": "shan4 xing4",          # 单 shan4
    "萝卜": "luo2 bo5",                                    # 卜 bo5
    "占卜": "zhan1 bu3", "占星": "zhan1 xing1",            # 占 zhan1
    "卡壳": "qia3 ke2", "关卡": "guan1 qia3",              # 卡 qia3
    "大厦": "da4 sha4",                                    # 厦 sha4
    "参差": "cen1 ci1",                                    # 参 cen1 / 差 ci1
    "人参": "ren2 shen1",                                  # 参 shen1
    "号叫": "hao2 jiao4", "哀号": "ai1 hao2",              # 号 hao2
    "胡同": "hu2 tong4",                                   # 同 tong4
    "呕吐": "ou3 tu4", "吐血": "tu4 xie3",                 # 吐 tu4
    "附和": "fu4 he4", "唱和": "chang4 he4",
    "和面": "huo2 mian4", "搅和": "jiao3 huo5",
    "暖和": "nuan3 huo5",                                  # 和 he4/huo2/huo5
    "喝彩": "he4 cai3",                                    # 喝 he4
    "猪圈": "zhu1 juan4", "圈养": "juan4 yang3",           # 圈 juan4
    "奇数": "ji1 shu4",                                    # 奇 ji1
    "投奔": "tou2 ben4", "奔头": "ben4 tou5",              # 奔 ben4
    "一宿": "yi4 xiu3", "星宿": "xing1 xiu4",              # 宿 xiu3/xiu4
    "将领": "jiang4 ling3", "大将": "da4 jiang4",          # 将 jiang4
    "少年": "shao4 nian2", "少女": "shao4 nv3",            # 少 shao4
    "尽管": "jin3 guan3", "尽量": "jin3 liang4",           # 尽 jin3
    "岗位": "gang3 wei4", "站岗": "zhan4 gang3",
    "山岗": "shan1 gang1",                                 # 岗 gang3/gang1
    "小巷": "xiao3 xiang4", "巷道": "hang4 dao4",          # 巷 xiang4/hang4
    "妥帖": "tuo3 tie1", "请帖": "qing3 tie3",
    "字帖": "zi4 tie4",                                    # 帖 tie1/tie3
    "揣度": "chuai3 duo2", "忖度": "cun3 duo2",            # 度 duo2
    "上当": "shang4 dang4", "当作": "dang4 zuo4",
    "恰当": "qia4 dang4",                                  # 当 dang4
    "待着": "dai1 zhe5", "待会": "dai1 hui4",              # 待 dai1
    "扁舟": "pian1 zhou1", "扁平": "bian3 ping2",          # 扁 pian1/bian3
    "包扎": "bao1 za1", "挣扎": "zheng1 zha2",             # 扎 za1/zha2
    "扫帚": "sao4 zhou5",                                  # 扫 sao4
    "重担": "zhong4 dan4", "扁担": "bian3 dan5",           # 担 dan4/dan5
    "挑战": "tiao3 zhan4", "挑衅": "tiao3 xin4",           # 挑 tiao3
    "拮据": "jie2 ju1",                                    # 据 ju1
    "撒谎": "sa1 huang3", "撒娇": "sa1 jiao1",             # 撒 sa1
    "北斗": "bei3 dou3", "漏斗": "lou4 dou3",              # 斗 dou3
    "晃眼": "huang3 yan3",                                 # 晃 huang3
    "曝光": "bao4 guang1",                                 # 曝 bao4
    "弯曲": "wan1 qu1", "曲线": "qu1 xian4",
    "曲折": "qu1 zhe2",                                    # 曲 qu1
    "更换": "geng1 huan4", "三更": "san1 geng1",
    "更新": "geng1 xin1",                                  # 更 geng1
    "朴氏": "piao2 shi4",                                  # 朴 piao2 (surname)
    "笔杆": "bi3 gan3", "枪杆": "qiang1 gan3",
    "杆菌": "gan3 jun1",                                   # 杆 gan3
    "查氏": "zha1 shi4",                                   # 查 zha1 (surname)
    "蛮横": "man2 heng4", "横财": "heng4 cai2",            # 横 heng4
    "沉没": "chen2 mo4", "没收": "mo4 shou1",
    "淹没": "yan1 mo4",                                    # 没 mo4
    "泡桐": "pao1 tong2",                                  # 泡 pao1
    "济南": "ji3 nan2", "济济一堂": "ji3 ji3 yi4 tang2",   # 济 ji3
    "混蛋": "hun2 dan4", "混浊": "hun2 zhuo2",             # 混 hun2
    "漂流": "piao1 liu2", "漂浮": "piao1 fu2",
    "漂白": "piao3 bai2",                                  # 漂 piao1/piao3
    "油炸": "you2 zha2", "炸酱": "zha2 jiang4",            # 炸 zha2
    "燕京": "yan1 jing1", "燕山": "yan1 shan1",            # 燕 yan1
    "片子": "pian1 zi5",                                   # 片 pian1
    "率领": "shuai4 ling3", "率先": "shuai4 xian1",        # 率 shuai4
    "的士": "di1 shi4", "打的": "da3 di1",                 # 的 di1
    "反省": "fan3 xing3", "省亲": "xing3 qin1",            # 省 xing3
    "看守": "kan1 shou3", "看护": "kan1 hu4",              # 看 kan1
    "着数": "zhao1 shu4",                                  # 着 zhao1
    "矫正": "jiao3 zheng4",                                # 矫 jiao3
    "情不自禁": "qing2 bu4 zi4 jin1",
    "禁受": "jin1 shou4",                                  # 禁 jin1
    "对称": "dui4 chen4", "称职": "chen4 zhi2",
    "称心": "chen4 xin1",                                  # 称 chen4
    "粘稠": "nian2 chou2", "粘液": "nian2 ye4",            # 粘 nian2
    "累赘": "lei2 zhui4", "积累": "ji1 lei3",
    "累计": "lei3 ji4",                                    # 累 lei2/lei3
    "纤维": "xian1 wei2", "纤夫": "qian4 fu1",             # 纤 xian1/qian4
    "结实": "jie1 shi5", "结巴": "jie1 ba5",               # 结 jie1
    "给予": "ji3 yu3", "供给": "gong1 ji3",
    "给养": "ji3 yang3",                                   # 给 ji3
    "缝隙": "feng4 xi4", "门缝": "men2 feng4",             # 缝 feng4
    "肖像": "xiao4 xiang4", "肖氏": "xiao1 shi4",          # 肖 xiao4/xiao1
    "心脏": "xin1 zang4", "肝脏": "gan1 zang4",
    "内脏": "nei4 zang4",                                  # 脏 zang4
    "宿舍": "su4 she4", "校舍": "xiao4 she4",              # 舍 she4
    "掉色": "diao4 shai3", "色子": "shai3 zi5",            # 色 shai3
    "薄荷": "bo4 he5",                                     # 薄 bo4
    "西藏": "xi1 zang4", "宝藏": "bao3 zang4",             # 藏 zang4
    "道行": "dao4 heng5",                                  # 行 heng5
    "要求": "yao1 qiu2", "要挟": "yao1 xie2",              # 要 yao1
    "道观": "dao4 guan4",                                  # 观 guan4
    "角色": "jue2 se4", "主角": "zhu3 jue2",
    "角逐": "jue2 zhu2",                                   # 角 jue2
    "押解": "ya1 jie4", "解送": "jie4 song4",
    "解数": "xie4 shu4", "解氏": "xie4 shi4",              # 解 jie4/xie4
    "游说": "you2 shui4",                                  # 说 shui4
    "踏实": "ta1 shi5",                                    # 踏 ta1
    "丢卒保车": "diu1 zu2 bao3 ju1",                       # 车 ju1 (chess)
    "半身不遂": "ban4 shen1 bu4 sui2",                     # 遂 sui2
    "测量": "ce4 liang2", "丈量": "zhang4 liang2",         # 量 liang2
    "钻石": "zuan4 shi2", "电钻": "dian4 zuan4",           # 钻 zuan4
    "铺设": "pu1 she4", "铺垫": "pu1 dian4",               # 铺 pu1
    "灾难": "zai1 nan4", "难民": "nan4 min2",
    "遇难": "yu4 nan4",                                    # 难 nan4
}

# readings with no standard word-level realization in our lexicon,
# excluded from the coverage assertion (reason per line)
UNREALIZED: dict[str, str] = {
    "乌:wu4": "乌拉(boot) dialect-only; standard reading wu1",
    "乐:le5": "neutral-tone allophone of le4 (快乐 in unstressed position)",
    "了:liao5": "neutral-tone allophone of liao3 (末了)",
    "仔:zai5": "neutral-tone allophone of zai3 (Cantonese-loan 靓仔-type)",
    "仔:zi5": "neutral-tone allophone of zi3",
    "会:hui5": "neutral-tone allophone of hui4 (一会儿)",
    "几:ji2": "nonstandard; modern readings are ji1/ji3",
    "勒:le5": "neutral-tone allophone of le4/lei1",
    "卡:ka2": "nonstandard tone variant of ka3",
    "圈:quan5": "neutral-tone allophone of quan1",
    "发:fa5": "neutral-tone allophone of fa4 (头发 tóufa)",
    "号:hao5": "neutral-tone allophone of hao4",
    "同:tong5": "neutral-tone allophone of tong4 (胡同)",
    "吐:tu2": "nonstandard (吐蕃 disputed Tǔbō/Tūbó)",
    "和:he5": "neutral-tone allophone of he2",
    "和:huo4": "和药/两和 rare; huo2/huo5 realized instead",
    "地:di5": "neutral-tone variant distinct from particle de5",
    "塞:sai2": "nonstandard; standard readings sai1/sai4/se4",
    "好:hao5": "neutral-tone allophone of hao3",
    "宁:ning5": "neutral-tone allophone of ning2",
    "弹:tan5": "neutral-tone allophone of tan2",
    "度:du5": "neutral-tone allophone of du4",
    "当:dang5": "neutral-tone allophone of dang1 (叮当)",
    "得:dei5": "neutral-tone allophone of dei3",
    "撒:sa5": "neutral-tone allophone of sa1/sa3",
    "散:san5": "neutral-tone allophone of san3/san4",
    "数:shu5": "neutral-tone allophone of shu4",
    "曾:ceng1": "nonstandard; modern readings ceng2/zeng1",
    "朴:pu2": "nonstandard; standard readings pu3/piao2/po1/po4",
    "泡:pao5": "neutral-tone allophone of pao4",
    "混:hun3": "nonstandard tone variant of hun4",
    "混:hun5": "neutral-tone allophone of hun4",
    "熟:shou2": "colloquial variant of shu2 (same morpheme)",
    "的:di5": "neutral-tone variant; particle realized as de5",
    "相:xiang5": "neutral-tone allophone of xiang4",
    "看:kan5": "neutral-tone allophone of kan4",
    "着:zhao5": "neutral-tone allophone of zhao2",
    "着:zhuo5": "neutral-tone allophone of zhuo2",
    "系:xi5": "neutral-tone allophone of xi4 (关系 guānxi)",
    "累:lei5": "neutral-tone allophone of lei4",
    "结:jie5": "neutral-tone allophone of jie2",
    "给:gei5": "neutral-tone allophone of gei3",
    "缝:feng5": "neutral-tone allophone of feng4",
    "行:hang5": "neutral-tone allophone of hang2",
    "行:xing4": "nonstandard (德行 déxing realized with xing2)",
    "觉:jiao5": "neutral-tone allophone of jiao4 (睡觉)",
    "量:liang5": "neutral-tone allophone of liang4 (打量)",
    "长:chang3": "nonstandard; modern readings chang2/zhang3",
    "难:nan5": "neutral-tone allophone of nan4 (灾难 unstressed)",
}
