package ssw;

/**
 * Immutable alignment result matching the reference's ssw.Alignment POJO
 * (ref: src/ssw/Alignment.java:9-66), which mirrors the C s_align struct
 * (ref: src/ssw.h:55-66).
 */
public class Alignment {
    public final short score1;
    public final short score2;
    public final int ref_begin1;
    public final int ref_end1;
    public final int read_begin1;
    public final int read_end1;
    public final int ref_end2;
    public final String cigar;

    public Alignment(short score1, short score2, int ref_begin1,
            int ref_end1, int read_begin1, int read_end1, int ref_end2,
            String cigar) {
        this.score1 = score1;
        this.score2 = score2;
        this.ref_begin1 = ref_begin1;
        this.ref_end1 = ref_end1;
        this.read_begin1 = read_begin1;
        this.read_end1 = read_end1;
        this.ref_end2 = ref_end2;
        this.cigar = cigar;
    }

    @Override
    public String toString() {
        return "score1=" + score1 + " score2=" + score2
                + " ref=[" + ref_begin1 + "," + ref_end1 + "]"
                + " read=[" + read_begin1 + "," + read_end1 + "]"
                + " ref_end2=" + ref_end2 + " cigar=" + cigar;
    }
}
