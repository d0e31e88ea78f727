// PIZ codec for OpenEXR scanline blocks (wavelet + Huffman), implemented
// from the public OpenEXR file-format specification (OpenEXRFileLayout and
// the documented PIZ algorithm: ImfPizCompressor/ImfHuf/ImfWav semantics).
// Used by iris_tpu/utils/exr.py via ctypes — real FIPT/ScanNet++ datasets
// commonly ship PIZ-compressed EXRs that the pure-python codec (ZIP/ZIPS)
// cannot read, and this image has no OpenEXR/cv2-EXR backend.
//
// Data model: a PIZ block holds per-channel planes ("channel-major"): for
// each channel (header order), ny rows of nx*size uint16 words (size = 1
// for HALF, 2 for FLOAT/UINT whose bytes are reinterpreted as LE u16
// pairs). The caller (python) converts between this layout and the
// scanline-interleaved layout of the EXR chunk.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

typedef uint64_t u64;
typedef uint32_t u32;
typedef uint16_t u16;
typedef uint8_t u8;

// ----------------------------------------------------------------- bitmap

static const int USHORT_RANGE = 1 << 16;
static const int BITMAP_SIZE = USHORT_RANGE >> 3;

static void bitmapFromData(const u16 *data, long n, u8 *bitmap,
                           u16 &minNonZero, u16 &maxNonZero) {
    memset(bitmap, 0, BITMAP_SIZE);
    for (long i = 0; i < n; ++i)
        bitmap[data[i] >> 3] |= (1 << (data[i] & 7));
    bitmap[0] &= ~1;  // zero is implicitly present, never stored
    minNonZero = BITMAP_SIZE - 1;
    maxNonZero = 0;
    for (int i = 0; i < BITMAP_SIZE; ++i)
        if (bitmap[i]) {
            if (i < minNonZero) minNonZero = (u16)i;
            if (i > maxNonZero) maxNonZero = (u16)i;
        }
}

static u16 forwardLutFromBitmap(const u8 *bitmap, u16 *lut) {
    int k = 0;
    for (int i = 0; i < USHORT_RANGE; ++i) {
        if (i == 0 || (bitmap[i >> 3] & (1 << (i & 7))))
            lut[i] = (u16)k++;
        else
            lut[i] = 0;
    }
    return (u16)(k - 1);
}

static u16 reverseLutFromBitmap(const u8 *bitmap, u16 *lut) {
    int k = 0;
    for (int i = 0; i < USHORT_RANGE; ++i)
        if (i == 0 || (bitmap[i >> 3] & (1 << (i & 7))))
            lut[k++] = (u16)i;
    int n = k - 1;
    while (k < USHORT_RANGE) lut[k++] = 0;
    return (u16)n;
}

static void applyLut(const u16 *lut, u16 *data, long n) {
    for (long i = 0; i < n; ++i) data[i] = lut[data[i]];
}

// ---------------------------------------------------------------- wavelet

static const int NBITS = 16;
static const int A_OFFSET = 1 << (NBITS - 1);
static const int M_OFFSET = 1 << (NBITS - 1);
static const int MOD_MASK = (1 << NBITS) - 1;

static inline void wenc14(u16 a, u16 b, u16 &l, u16 &h) {
    short as = (short)a, bs = (short)b;
    short ms = (as + bs) >> 1;
    short ds = as - bs;
    l = (u16)ms;
    h = (u16)ds;
}

static inline void wdec14(u16 l, u16 h, u16 &a, u16 &b) {
    short ls = (short)l, hs = (short)h;
    int hi = hs;
    int ai = ls + (hi & 1) + (hi >> 1);
    short as = (short)ai;
    short bs = (short)(ai - hi);
    a = (u16)as;
    b = (u16)bs;
}

static inline void wenc16(u16 a, u16 b, u16 &l, u16 &h) {
    int ao = (a + A_OFFSET) & MOD_MASK;
    int m = (ao + b) >> 1;
    int d = ao - b;
    if (d < 0) m = (m + M_OFFSET) & MOD_MASK;
    d &= MOD_MASK;
    l = (u16)m;
    h = (u16)d;
}

static inline void wdec16(u16 l, u16 h, u16 &a, u16 &b) {
    int m = l, d = h;
    int bb = (m - (d >> 1)) & MOD_MASK;
    int aa = (d + bb - A_OFFSET) & MOD_MASK;
    b = (u16)bb;
    a = (u16)aa;
}

static void wav2Encode(u16 *in, int nx, int ox, int ny, int oy, u16 mx) {
    bool w14 = (mx < (1 << 14));
    int n = (nx > ny) ? ny : nx;
    int p = 1, p2 = 2;
    while (p2 <= n) {
        u16 *py = in;
        u16 *ey = in + oy * (ny - p2);
        int oy1 = oy * p, oy2 = oy * p2, ox1 = ox * p, ox2 = ox * p2;
        u16 i00, i01, i10, i11;
        u16 *px = in;
        for (; py <= ey; py += oy2) {
            px = py;
            u16 *ex = py + ox * (nx - p2);
            for (; px <= ex; px += ox2) {
                u16 *p01 = px + ox1;
                u16 *p10 = px + oy1;
                u16 *p11 = p10 + ox1;
                if (w14) {
                    wenc14(*px, *p01, i00, i01);
                    wenc14(*p10, *p11, i10, i11);
                    wenc14(i00, i10, *px, *p10);
                    wenc14(i01, i11, *p01, *p11);
                } else {
                    wenc16(*px, *p01, i00, i01);
                    wenc16(*p10, *p11, i10, i11);
                    wenc16(i00, i10, *px, *p10);
                    wenc16(i01, i11, *p01, *p11);
                }
            }
            if (nx & p) {
                u16 *p10 = px + oy1;
                if (w14)
                    wenc14(*px, *p10, i00, *p10);
                else
                    wenc16(*px, *p10, i00, *p10);
                *px = i00;
            }
        }
        if (ny & p) {
            u16 *px2 = py;
            u16 *ex = py + ox * (nx - p2);
            for (; px2 <= ex; px2 += ox2) {
                u16 *p01 = px2 + ox1;
                if (w14)
                    wenc14(*px2, *p01, i00, *p01);
                else
                    wenc16(*px2, *p01, i00, *p01);
                *px2 = i00;
            }
        }
        p = p2;
        p2 <<= 1;
    }
}

static void wav2Decode(u16 *in, int nx, int ox, int ny, int oy, u16 mx) {
    bool w14 = (mx < (1 << 14));
    int n = (nx > ny) ? ny : nx;
    int p = 1;
    while (p <= n) p <<= 1;
    p >>= 1;
    int p2 = p;
    p >>= 1;
    while (p >= 1) {
        u16 *py = in;
        u16 *ey = in + oy * (ny - p2);
        int oy1 = oy * p, oy2 = oy * p2, ox1 = ox * p, ox2 = ox * p2;
        u16 i00, i01, i10, i11;
        u16 *px = in;
        for (; py <= ey; py += oy2) {
            px = py;
            u16 *ex = py + ox * (nx - p2);
            for (; px <= ex; px += ox2) {
                u16 *p01 = px + ox1;
                u16 *p10 = px + oy1;
                u16 *p11 = p10 + ox1;
                if (w14) {
                    wdec14(*px, *p10, i00, i10);
                    wdec14(*p01, *p11, i01, i11);
                    wdec14(i00, i01, *px, *p01);
                    wdec14(i10, i11, *p10, *p11);
                } else {
                    wdec16(*px, *p10, i00, i10);
                    wdec16(*p01, *p11, i01, i11);
                    wdec16(i00, i01, *px, *p01);
                    wdec16(i10, i11, *p10, *p11);
                }
            }
            if (nx & p) {
                u16 *p10 = px + oy1;
                if (w14)
                    wdec14(*px, *p10, i00, *p10);
                else
                    wdec16(*px, *p10, i00, *p10);
                *px = i00;
            }
        }
        if (ny & p) {
            u16 *px2 = py;
            u16 *ex = py + ox * (nx - p2);
            for (; px2 <= ex; px2 += ox2) {
                u16 *p01 = px2 + ox1;
                if (w14)
                    wdec14(*px2, *p01, i00, *p01);
                else
                    wdec16(*px2, *p01, i00, *p01);
                *px2 = i00;
            }
        }
        p2 = p;
        p >>= 1;
    }
}

// ---------------------------------------------------------------- huffman

static const int HUF_ENCBITS = 16;
static const int HUF_DECBITS = 14;
static const int HUF_ENCSIZE = (1 << HUF_ENCBITS) + 1;  // 65537
static const int HUF_DECSIZE = 1 << HUF_DECBITS;
static const int HUF_DECMASK = HUF_DECSIZE - 1;

struct HufDec {
    int len;
    int lit;
    std::vector<int> *p;
};

static inline int hufLength(u64 code) { return (int)(code & 63); }
static inline u64 hufCode(u64 code) { return code >> 6; }

struct BitWriter {
    u8 *out;
    u64 c = 0;
    int lc = 0;
    long nbytes = 0;
    explicit BitWriter(u8 *o) : out(o) {}
    void outputBits(int nBits, u64 bits) {
        c = (c << nBits) | (bits & ((nBits >= 64) ? ~0ULL
                                                  : ((1ULL << nBits) - 1)));
        lc += nBits;
        while (lc >= 8) {
            out[nbytes++] = (u8)(c >> (lc - 8));
            lc -= 8;
        }
    }
    void outputCode(u64 code) { outputBits(hufLength(code), hufCode(code)); }
    long flush() {
        if (lc) out[nbytes++] = (u8)(c << (8 - lc));
        return nbytes;
    }
};

struct BitReader {
    const u8 *in;
    const u8 *ie;
    u64 c = 0;
    int lc = 0;
    BitReader(const u8 *i, const u8 *e) : in(i), ie(e) {}
    bool getBits(int nBits, u64 &bits) {
        while (lc < nBits) {
            if (in >= ie) return false;
            c = (c << 8) | *in++;
            lc += 8;
        }
        lc -= nBits;
        bits = (c >> lc) & ((1ULL << nBits) - 1);
        return true;
    }
};

// Huffman code lengths via repeated merge of the two lowest-frequency
// chains (each chain links symbols whose depth increments together).
static void hufBuildEncTable(u64 *frq, int *im_out, int *iM_out) {
    int im = 0;
    while (im < HUF_ENCSIZE && !frq[im]) im++;
    if (im == HUF_ENCSIZE) im = 0;

    std::vector<int> hlink(HUF_ENCSIZE);
    std::vector<int> heap;  // indices, min-heap by frq
    heap.reserve(HUF_ENCSIZE);
    int iM = im;
    for (int i = im; i < HUF_ENCSIZE; ++i) {
        hlink[i] = i;
        if (frq[i]) {
            heap.push_back(i);
            iM = i;
        }
    }
    // pseudo-symbol after the real maximum: becomes the run-length code
    iM += 1;
    if (iM >= HUF_ENCSIZE) iM = HUF_ENCSIZE - 1;
    if (!frq[iM]) {
        frq[iM] = 1;
        hlink[iM] = iM;
        heap.push_back(iM);
    }

    auto cmp = [&](int a, int b) { return frq[a] > frq[b]; };  // min-heap
    std::make_heap(heap.begin(), heap.end(), cmp);

    std::vector<u64> scode(HUF_ENCSIZE, 0);
    while (heap.size() > 1) {
        std::pop_heap(heap.begin(), heap.end(), cmp);
        int mm = heap.back();
        heap.pop_back();
        std::pop_heap(heap.begin(), heap.end(), cmp);
        int m = heap.back();
        heap.pop_back();
        frq[mm] += frq[m];
        heap.push_back(mm);
        std::push_heap(heap.begin(), heap.end(), cmp);
        // bump depth of every symbol in both chains, then link them
        for (int j = mm;; j = hlink[j]) {
            scode[j]++;
            if (hlink[j] == j) {
                hlink[j] = m;
                break;
            }
        }
        for (int j = m;; j = hlink[j]) {
            scode[j]++;
            if (hlink[j] == j) break;
        }
    }
    // canonical codes
    {
        u64 n[59] = {0};
        for (int i = 0; i < HUF_ENCSIZE; ++i) n[scode[i]]++;
        u64 c = 0;
        for (int i = 58; i > 0; --i) {
            u64 nc = (c + n[i]) >> 1;
            n[i] = c;
            c = nc;
        }
        for (int i = 0; i < HUF_ENCSIZE; ++i) {
            int l = (int)scode[i];
            if (l > 0)
                frq[i] = (u64)l | (n[l]++ << 6);
            else
                frq[i] = 0;
        }
    }
    *im_out = im;
    *iM_out = iM;
}

static const int SHORT_ZEROCODE_RUN = 59;
static const int LONG_ZEROCODE_RUN = 63;
static const int SHORTEST_LONG_RUN = 2 + LONG_ZEROCODE_RUN
                                     - SHORT_ZEROCODE_RUN;   // 6
static const int LONGEST_LONG_RUN = 255 + SHORTEST_LONG_RUN;  // 261

static long hufPackEncTable(const u64 *hcode, int im, int iM, u8 *out) {
    BitWriter w(out);
    for (int i = im; i <= iM; ++i) {
        int l = hufLength(hcode[i]);
        if (l == 0) {
            int zerun = 1;
            while (i < iM && zerun < LONGEST_LONG_RUN) {
                if (hufLength(hcode[i + 1]) > 0) break;
                i++;
                zerun++;
            }
            if (zerun >= 2) {
                if (zerun >= SHORTEST_LONG_RUN) {
                    w.outputBits(6, LONG_ZEROCODE_RUN);
                    w.outputBits(8, zerun - SHORTEST_LONG_RUN);
                } else {
                    w.outputBits(6, SHORT_ZEROCODE_RUN + zerun - 2);
                }
                continue;
            }
        }
        w.outputBits(6, l);
    }
    return w.flush();
}

static bool hufUnpackEncTable(const u8 **pin, const u8 *ie, int im, int iM,
                              u64 *hcode) {
    memset(hcode, 0, sizeof(u64) * HUF_ENCSIZE);
    BitReader r(*pin, ie);
    for (int i = im; i <= iM; ++i) {
        u64 l;
        if (!r.getBits(6, l)) return false;
        if (l == (u64)LONG_ZEROCODE_RUN) {
            u64 zr;
            if (!r.getBits(8, zr)) return false;
            int zerun = (int)zr + SHORTEST_LONG_RUN;
            if (i + zerun - 1 > iM + 1) return false;
            for (int j = 0; j < zerun; ++j)
                if (i + j <= iM) hcode[i + j] = 0;
            i += zerun - 1;
        } else if (l >= (u64)SHORT_ZEROCODE_RUN) {
            int zerun = (int)l - SHORT_ZEROCODE_RUN + 2;
            if (i + zerun - 1 > iM + 1) return false;
            for (int j = 0; j < zerun; ++j)
                if (i + j <= iM) hcode[i + j] = 0;
            i += zerun - 1;
        } else {
            hcode[i] = l;
        }
    }
    *pin = r.in;  // table is byte-aligned: reader consumed whole bytes
    // canonical codes from lengths
    u64 n[59] = {0};
    for (int i = 0; i < HUF_ENCSIZE; ++i) n[hcode[i]]++;
    u64 c = 0;
    for (int i = 58; i > 0; --i) {
        u64 nc = (c + n[i]) >> 1;
        n[i] = c;
        c = nc;
    }
    for (int i = 0; i < HUF_ENCSIZE; ++i) {
        int l = (int)hcode[i];
        if (l > 0) hcode[i] = (u64)l | (n[l]++ << 6);
    }
    return true;
}

static bool hufBuildDecTable(const u64 *hcode, int im, int iM,
                             std::vector<HufDec> &hdecod) {
    hdecod.assign(HUF_DECSIZE, HufDec{0, 0, nullptr});
    for (int c = im; c <= iM; ++c) {
        u64 code = hufCode(hcode[c]);
        int l = hufLength(hcode[c]);
        if (code >> l) return false;
        if (l > HUF_DECBITS) {
            HufDec &pl = hdecod[code >> (l - HUF_DECBITS)];
            if (pl.len) return false;
            if (!pl.p) pl.p = new std::vector<int>();
            pl.p->push_back(c);
        } else if (l) {
            HufDec *pl = &hdecod[code << (HUF_DECBITS - l)];
            for (u64 i = 1ULL << (HUF_DECBITS - l); i > 0; --i, ++pl) {
                if (pl->len || pl->p) return false;
                pl->len = l;
                pl->lit = c;
            }
        }
    }
    return true;
}

static void hufFreeDecTable(std::vector<HufDec> &hdecod) {
    for (auto &d : hdecod)
        if (d.p) {
            delete d.p;
            d.p = nullptr;
        }
}

static long hufEncode(const u64 *hcode, const u16 *in, long ni, int rlc,
                      u8 *out, long *nBits) {
    BitWriter w(out);
    auto sendCode = [&](u64 sCode, int runCount, u64 runCode) {
        if (hufLength(sCode) + hufLength(runCode) + 8
            < hufLength(sCode) * runCount) {
            w.outputCode(sCode);
            w.outputCode(runCode);
            w.outputBits(8, runCount);
        } else {
            for (int i = 0; i <= runCount; ++i) w.outputCode(sCode);
        }
    };
    int s = in[0];
    int cs = 0;
    for (long i = 1; i < ni; ++i) {
        if ((int)in[i] == s && cs < 255) {
            cs++;
        } else {
            sendCode(hcode[s], cs, hcode[rlc]);
            s = in[i];
            cs = 0;
        }
    }
    sendCode(hcode[s], cs, hcode[rlc]);
    long totalBits = w.nbytes * 8 + w.lc;
    long nb = w.flush();
    *nBits = totalBits;
    return nb;
}

static bool hufDecode(const u64 *hcode, std::vector<HufDec> &hdecod,
                      const u8 *in, long nBits, int rlc, long no, u16 *out) {
    u64 c = 0;
    int lc = 0;
    const u8 *ie = in + (nBits + 7) / 8;
    u16 *outb = out;
    u16 *oe = out + no;

    auto getChar = [&]() {
        c = (c << 8) | *in++;
        lc += 8;
    };
    auto emit = [&](int po) -> bool {
        if (po == rlc) {
            if (lc < 8) {
                if (in >= ie) return false;
                getChar();
            }
            lc -= 8;
            int cs = (int)((c >> lc) & 0xFF);
            if (out == outb || out + cs > oe) return false;
            u16 s = out[-1];
            while (cs-- > 0) *out++ = s;
        } else {
            if (out >= oe) return false;
            *out++ = (u16)po;
        }
        return true;
    };

    while (in < ie) {
        getChar();
        while (lc >= HUF_DECBITS) {
            const HufDec &pl = hdecod[(c >> (lc - HUF_DECBITS)) & HUF_DECMASK];
            if (pl.len) {
                lc -= pl.len;
                if (!emit(pl.lit)) return false;
            } else {
                if (!pl.p) return false;
                bool found = false;
                for (int c2 : *pl.p) {
                    int l2 = hufLength(hcode[c2]);
                    while (lc < l2 && in < ie) getChar();
                    if (lc >= l2
                        && hufCode(hcode[c2])
                               == ((c >> (lc - l2))
                                   & ((1ULL << l2) - 1))) {
                        lc -= l2;
                        if (!emit(c2)) return false;
                        found = true;
                        break;
                    }
                }
                if (!found) return false;
            }
        }
    }
    // remaining bits in the last partial byte
    int i = (int)((8 - nBits) & 7);
    c >>= i;
    lc -= i;
    while (lc > 0) {
        const HufDec &pl = hdecod[(c << (HUF_DECBITS - lc)) & HUF_DECMASK];
        if (pl.len && pl.len <= lc) {
            lc -= pl.len;
            if (!emit(pl.lit)) return false;
        } else {
            return false;
        }
    }
    return out == oe;
}

static inline void writeU32(u8 *p, u32 v) { memcpy(p, &v, 4); }
static inline u32 readU32(const u8 *p) {
    u32 v;
    memcpy(&v, p, 4);
    return v;
}

// hufCompress stream: [im u32][iM u32][tableLen u32][nBits u32][future u32]
// [packed table][code bits]
static long hufCompress(const u16 *raw, long nRaw, u8 *out) {
    if (nRaw == 0) return 0;
    std::vector<u64> freq(HUF_ENCSIZE, 0);
    for (long i = 0; i < nRaw; ++i) freq[raw[i]]++;
    int im, iM;
    hufBuildEncTable(freq.data(), &im, &iM);
    u8 *tableStart = out + 20;
    long tableLen = hufPackEncTable(freq.data(), im, iM, tableStart);
    long nBits = 0;
    long dataLen = hufEncode(freq.data(), raw, nRaw, iM,
                             tableStart + tableLen, &nBits);
    writeU32(out, (u32)im);
    writeU32(out + 4, (u32)iM);
    writeU32(out + 8, (u32)tableLen);
    writeU32(out + 12, (u32)nBits);
    writeU32(out + 16, 0);
    return 20 + tableLen + dataLen;
}

static bool hufUncompress(const u8 *in, long nIn, u16 *raw, long nRaw) {
    if (nRaw == 0) return true;
    if (nIn < 20) return false;
    int im = (int)readU32(in);
    int iM = (int)readU32(in + 4);
    long nBits = (long)readU32(in + 12);
    if (im < 0 || im >= HUF_ENCSIZE || iM < 0 || iM >= HUF_ENCSIZE)
        return false;
    long tableLen = (long)readU32(in + 8);
    if (20 + tableLen > nIn) return false;
    const u8 *ptr = in + 20;
    const u8 *ie = in + nIn;
    std::vector<u64> hcode(HUF_ENCSIZE);
    if (!hufUnpackEncTable(&ptr, in + 20 + tableLen, im, iM, hcode.data()))
        return false;
    ptr = in + 20 + tableLen;  // table is byte-padded; trust the header
    if (nBits > 8 * (ie - ptr)) return false;
    std::vector<HufDec> hdecod;
    if (!hufBuildDecTable(hcode.data(), im, iM, hdecod)) {
        hufFreeDecTable(hdecod);
        return false;
    }
    bool ok = hufDecode(hcode.data(), hdecod, ptr, nBits, iM, nRaw, raw);
    hufFreeDecTable(hdecod);
    return ok;
}

// ------------------------------------------------------------- PIZ driver

// tmp: channel-major u16 planes (see header comment). Returns compressed
// byte count, or -1 on error / insufficient capacity.
extern "C" long piz_compress(const u16 *tmp_in, long n_u16, u8 *out,
                             long out_cap, int n_ch, const int *nx,
                             const int *ny, const int *size) {
    if (out_cap < (long)(6 + BITMAP_SIZE + 20 + n_u16 * 3 + 4096)) return -1;
    std::vector<u16> tmp(tmp_in, tmp_in + n_u16);
    std::vector<u8> bitmap(BITMAP_SIZE);
    u16 minNonZero, maxNonZero;
    bitmapFromData(tmp.data(), n_u16, bitmap.data(), minNonZero, maxNonZero);
    std::vector<u16> lut(USHORT_RANGE);
    u16 maxValue = forwardLutFromBitmap(bitmap.data(), lut.data());
    applyLut(lut.data(), tmp.data(), n_u16);

    long off = 0;
    for (int ci = 0; ci < n_ch; ++ci) {
        for (int j = 0; j < size[ci]; ++j)
            wav2Encode(tmp.data() + off + j, nx[ci], size[ci], ny[ci],
                       nx[ci] * size[ci], maxValue);
        off += (long)nx[ci] * ny[ci] * size[ci];
    }
    if (off != n_u16) return -1;

    u8 *p = out;
    memcpy(p, &minNonZero, 2);
    memcpy(p + 2, &maxNonZero, 2);
    p += 4;
    if (minNonZero <= maxNonZero) {
        memcpy(p, bitmap.data() + minNonZero, maxNonZero - minNonZero + 1);
        p += maxNonZero - minNonZero + 1;
    }
    long hufLen = hufCompress(tmp.data(), n_u16, p + 4);
    writeU32(p, (u32)hufLen);
    p += 4 + hufLen;
    return p - out;
}

extern "C" int piz_uncompress(const u8 *in, long n_in, u16 *out, long n_u16,
                              int n_ch, const int *nx, const int *ny,
                              const int *size) {
    if (n_in < 4) return 1;
    u16 minNonZero, maxNonZero;
    memcpy(&minNonZero, in, 2);
    memcpy(&maxNonZero, in + 2, 2);
    const u8 *p = in + 4;
    std::vector<u8> bitmap(BITMAP_SIZE, 0);
    if (maxNonZero >= BITMAP_SIZE) return 2;
    if (minNonZero <= maxNonZero) {
        long nb = maxNonZero - minNonZero + 1;
        if (p + nb > in + n_in) return 3;
        memcpy(bitmap.data() + minNonZero, p, nb);
        p += nb;
    }
    std::vector<u16> lut(USHORT_RANGE);
    u16 maxValue = reverseLutFromBitmap(bitmap.data(), lut.data());

    if (p + 4 > in + n_in) return 4;
    long hufLen = (long)readU32(p);
    p += 4;
    if (p + hufLen > in + n_in) return 5;
    if (!hufUncompress(p, hufLen, out, n_u16)) return 6;

    long off = 0;
    for (int ci = 0; ci < n_ch; ++ci) {
        for (int j = 0; j < size[ci]; ++j)
            wav2Decode(out + off + j, nx[ci], size[ci], ny[ci],
                       nx[ci] * size[ci], maxValue);
        off += (long)nx[ci] * ny[ci] * size[ci];
    }
    if (off != n_u16) return 7;
    applyLut(lut.data(), out, n_u16);
    return 0;
}

