#!/usr/bin/env perl
# Convert a WSJ .ndx index file into a list of .wv1 file paths (fresh
# implementation of the Kaldi wsj ndx2flist.pl contract).
#   ndx2flist.pl <corpus-root...> < file.ndx > file.flist
# ndx lines look like "13_16_1:wsj1/si_tr_s/4k0/4k0c030a.wv1" (disk id :
# relative path); corpus roots are searched for the relative path.

use strict;
use warnings;

my @roots = @ARGV;
@roots or die "ndx2flist.pl: give corpus root directories as arguments\n";

while (<STDIN>) {
    chomp;
    next if m/^;/ or not m/\S/;
    my $rel = $_;
    $rel =~ s/^\s*\S*:\s*//;   # strip the disk-id prefix
    $rel =~ s/^\s+|\s+$//g;
    $rel = lc($rel);
    # si_et_20.ndx entries carry no extension (the reference appends
    # .wv1 via awk before this script); normalize here
    $rel .= ".wv1" unless $rel =~ m/\.\w+$/;
    my $found = 0;
    foreach my $root (@roots) {
        # uppercase only the RELATIVE part (disc layouts vary); the
        # corpus root keeps its real case
        foreach my $cand ("$root/$rel", "$root/" . uc($rel)) {
            if (-e $cand) { print "$cand\n"; $found = 1; last; }
        }
        last if $found;
    }
    print STDERR "ndx2flist.pl: could not find $rel\n" unless $found;
}
